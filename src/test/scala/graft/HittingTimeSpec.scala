package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.HittingTime
import graft.graph.GraphOps

/** Expected hitting time via monotone Jacobi sweeps. */
class HittingTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sym(rows: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(rows.toDF("src", "dst"))

  def ht(edges: DataFrame, targets: Seq[Long], iters: Int = 60,
         parts: Int = 4): Map[Long, Double] =
    HittingTime.run(spark, edges, targets.toDF("id"), iters, parts)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("path 1-2-3 with target 3: h = (4, 3, 0)") {
    val got = ht(sym((1L, 2L), (2L, 3L)), Seq(3L))
    assert(math.abs(got(1L) - 4.0) < 1e-4)
    assert(math.abs(got(2L) - 3.0) < 1e-4)
    assert(got(3L) == 0.0)
  }

  test("star leaves hit the target center in exactly one step") {
    val got = ht(sym((1L, 2L), (1L, 3L), (1L, 4L)), Seq(1L))
    assert(got(2L) == 1.0 && got(3L) == 1.0 && got(4L) == 1.0)
  }

  test("triangle with one target: the symmetric pair at 2.0") {
    val got = ht(sym((1L, 2L), (2L, 3L), (1L, 3L)), Seq(3L))
    assert(math.abs(got(1L) - 2.0) < 1e-4)
    assert(math.abs(got(2L) - 2.0) < 1e-4)
  }

  test("volume sensitivity: same hops, thicker detour takes longer") {
    // both 1 and 10 are 1 hop from target 5, but 10 also neighbors a
    // 3-vertex blob it wanders into
    val thin = Seq((1L, 5L))
    val thick = Seq((10L, 5L), (10L, 11L), (10L, 12L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    val got = ht(sym(thin ++ thick: _*), Seq(5L), iters = 200)
    assert(got(1L) == 1.0)
    assert(got(10L) > 2.0, s"hub next to a blob must exceed 2: ${got(10L)}")
  }

  test("iterates increase monotonically toward the fixed point") {
    val es = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val a = ht(es, Seq(5L), iters = 5)
    val b = ht(es, Seq(5L), iters = 15)
    for (id <- a.keys) assert(a(id) <= b(id) + 1e-12, s"vertex $id")
  }

  test("edge-free target reports 0; edge-free non-target is absent") {
    val got = ht(sym((1L, 2L)), Seq(7L))
    assert(got(7L) == 0.0)
    assert(!got.contains(8L))
  }

  test("partitioning-invariant: 2 vs 8 partitions") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L), (4L, 5L))
    val a = ht(sym(es: _*), Seq(1L), iters = 40, parts = 2)
    val b = ht(sym(es: _*), Seq(1L), iters = 40, parts = 8)
    assert(a == b)
  }

  def absorb(edges: DataFrame, a: Seq[Long], b: Seq[Long],
             iters: Int = 80): Map[Long, Double] =
    HittingTime.absorption(spark, edges, a.toDF("id"), b.toDF("id"),
      iters, 4).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("absorption: voltage divider on the path 1-2-3-4") {
    val got = absorb(sym((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L), Seq(4L))
    assert(got(1L) == 1.0 && got(4L) == 0.0)
    assert(math.abs(got(2L) - 2.0 / 3) < 1e-4)
    assert(math.abs(got(3L) - 1.0 / 3) < 1e-4)
  }

  test("absorption: component with no positive converges to 0") {
    val got = absorb(sym((1L, 2L), (5L, 6L)), Seq(1L), Seq(6L))
    assert(got(2L) == 1.0) // only route is into A
    assert(got(5L) == 0.0)
  }

  test("absorption: overlapping target sets are rejected") {
    intercept[IllegalArgumentException] {
      absorb(sym((1L, 2L)), Seq(1L), Seq(1L))
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Cascade
import graft.graph.GraphOps

/** Monotone threshold cascade: frontier-incremental activation with
  * each edge messaging exactly once.
  */
class CascadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sym(rows: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(rows.toDF("src", "dst"))

  def seeds(ids: Long*): DataFrame = ids.toDF("id")

  def rounds(df: DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("k=1 from one seed is BFS: round = hop distance") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L))
    val got = rounds(Cascade.run(spark, sym(es: _*), seeds(1L), k = 1,
      numPartitions = 4))
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 5L -> 2, 4L -> 3))
  }

  test("k=2 stalls where only one active neighbor reaches") {
    // triangle 1-2-3 seeded at 1,2 cascades to 3; the tail 3-4 never
    // reaches k=2 at vertex 4
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = rounds(Cascade.run(spark, sym(es: _*), seeds(1L, 2L), k = 2,
      numPartitions = 4))
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("k=2 chain of triangles cascades fully") {
    // strip of triangles: each new vertex sees two active
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L))
    val got = rounds(Cascade.run(spark, sym(es: _*), seeds(1L, 2L), k = 2,
      numPartitions = 4))
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("fractional threshold: hub needs half its neighbors") {
    // hub 1 with leaves 2..7; need = ceil(6/2) = 3 active leaves
    val es = (2L to 7L).map(i => (1L, i))
    val one = rounds(Cascade.runFraction(spark, sym(es: _*),
      seeds(2L, 3L), num = 1, den = 2, numPartitions = 4))
    assert(!one.contains(1L), s"2 of 6 must not trip ceil(6/2)=3: $one")
    val thr = rounds(Cascade.runFraction(spark, sym(es: _*),
      seeds(2L, 3L, 4L), num = 1, den = 2, numPartitions = 4))
    assert(thr(1L) == 1)
  }

  test("monotonicity: more seeds activate a superset, never later") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), (2L, 4L))
    val small = rounds(Cascade.run(spark, sym(es: _*), seeds(1L), k = 1,
      numPartitions = 4))
    val big = rounds(Cascade.run(spark, sym(es: _*), seeds(1L, 3L), k = 1,
      numPartitions = 4))
    small.foreach { case (id, r) =>
      assert(big.contains(id) && big(id) <= r, s"vertex $id: $r -> ${big.get(id)}")
    }
  }

  test("isolated seed is reported at round 0 and spreads nothing") {
    val es = Seq((1L, 2L))
    val got = rounds(Cascade.run(spark, sym(es: _*), seeds(99L), k = 1,
      numPartitions = 2))
    assert(got == Map(99L -> 0))
  }

  test("partitioning-invariant: 2 vs 8 partitions") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (4L, 6L), (5L, 6L))
    val a = rounds(Cascade.run(spark, sym(es: _*), seeds(1L, 2L), k = 2,
      numPartitions = 2))
    val b = rounds(Cascade.run(spark, sym(es: _*), seeds(1L, 2L), k = 2,
      numPartitions = 8))
    assert(a == b)
  }
}

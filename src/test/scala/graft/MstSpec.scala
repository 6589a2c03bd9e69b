package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Mst

/** Borůvka MSF invariants: hand-checked MSTs, tie-break semantics,
  * spanning-forest edge count, and exact parity with an in-test
  * Kruskal union-find on the 1.5k-vertex arithmetic fixture.
  */
class MstSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def mstOf(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Mst.run(spark, edges.toDF("src", "dst", "weight"), numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("square with a heavy diagonal: diagonal excluded") {
    // cycle 0-1-2-3-0 with weights 1,2,3,4 and diagonal 0-2 weight 9
    val mst = mstOf(Seq((0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L),
      (3L, 0L, 4L), (0L, 2L, 9L)))
    assert(mst == Set((0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L)))
  }

  test("tied weights: the (w, u, v) order decides, deterministically") {
    // triangle with all weights equal: keep (0,1) and (0,2), drop (1,2)
    val mst = mstOf(Seq((0L, 1L, 5L), (1L, 2L, 5L), (0L, 2L, 5L)))
    assert(mst == Set((0L, 1L, 5L), (0L, 2L, 5L)))
  }

  test("disconnected graph: forest with |V| - #components edges") {
    val mst = mstOf(Seq((0L, 1L, 1L), (1L, 2L, 2L), (10L, 11L, 3L)))
    assert(mst == Set((0L, 1L, 1L), (1L, 2L, 2L), (10L, 11L, 3L)))
  }

  test("duplicate and reversed rows canonicalize to min weight per pair") {
    val mst = mstOf(Seq((0L, 1L, 7L), (1L, 0L, 3L), (1L, 2L, 4L)))
    assert(mst == Set((0L, 1L, 3L), (1L, 2L, 4L)))
  }

  test("single linkage: dendrogram cut groups below the threshold") {
    // chain 0-1 (w1), 1-2 (w5), 2-3 (w2): cut at 3 → {0,1}, {2,3}
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 5L), (2L, 3L, 2L))
      .toDF("src", "dst", "weight")
    val got = graft.algo.Mst.singleLinkage(spark, edges, threshold = 3L,
        numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("arithmetic fixture: exact parity with Kruskal union-find") {
    val r = spark.range(1500L).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(10L)) =!= 0)
    def rule(m: Long, c: Long) =
      r.select(col("a").as("src"),
        pmod(col("a") + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(1500L)).as("dst"))
    val ew = rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .withColumn("weight",
        lit(1L) + pmod(col("src") * 7 + col("dst") * 13, lit(97L)))

    val got = Mst.run(spark, ew, numPartitions = 4)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2)))
      .sortBy(e => (e._3, e._1, e._2))

    // Kruskal under the same (w, u, v) strict total order
    val edges = ew.collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2)))
      .sortBy(e => (e._3, e._1, e._2))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r0 = find(p); parent(x) = r0; r0 }
    }
    val ref = edges.filter { case (u, v, _) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; true } else false
    }
    assert(got.length == ref.length)
    assert(got.toSeq == ref.toSeq)
  }
}

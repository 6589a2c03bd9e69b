package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Coreness, KCore}
import graft.graph.GraphOps

/** Coreness (h-index refinement) against hand-computed core numbers
  * and cross-validated against the fixed-k peel: coreness(v) ≥ k ⟺
  * v survives KCore.run(k) — the defining equivalence, checked on a
  * structured random-ish graph for k = 2 and 3.
  */
class CorenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(e: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(e.toDF("src", "dst"))

  // K4 {1..4} (coreness 3) — path 4–5–6 into triangle {6,7,8}: the
  // path vertex 5 keeps both neighbors in the full graph, so min
  // degree is 2 everywhere and 5 sits in the 2-core — only the
  // pendant 9 (off 8) has coreness 1
  test("K4 + path + triangle + pendant: exact core numbers") {
    val g = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L), (6L, 8L), (8L, 9L))
    val out = Coreness.run(spark, g, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 1L))
  }

  test("coreness >= k agrees with the k-core peel on an arithmetic graph") {
    val n = 300L
    val base = spark.range(n).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(9L)) =!= 0)
    def rule(m: Long, c: Long) =
      base.select(col("a").as("src"),
        pmod(col("a") * 3 + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(n)).as("dst"))
    val sym = GraphOps.symmetrize(
      rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
        .filter(col("src") =!= col("dst")).distinct())

    val core = Coreness.run(spark, sym, numPartitions = 4).cache()
    for (k <- Seq(2, 3)) {
      val peel = KCore.run(spark, sym, k, numPartitions = 4)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val viaCoreness = core.filter(col("coreness") >= k)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(viaCoreness == peel, s"k=$k mismatch")
    }
    core.unpersist()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{KTruss, Trussness}
import graft.graph.GraphOps

/** Trussness h-index fixed point against hand-computed levels and the
  * defining equivalence with the fixed-k peel: τ(e) ≥ k ⟺ e in
  * KTruss.run(k), checked for k = 3 and 4 on an arithmetic graph.
  */
class TrussnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(e: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(e.toDF("src", "dst"))

  private def collect(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("K4 with a pendant: τ = 4 inside, 2 on the pendant") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val out = collect(Trussness.run(spark, edges(k4 :+ (4L, 9L): _*),
      numPartitions = 4))
    assert(out == k4.map(e => e -> 4L).toMap + ((4L, 9L) -> 2L))
  }

  test("bowtie (two triangles sharing an edge) collapses to τ = 3 everywhere") {
    // triangles {1,2,3} and {2,3,4} share edge (2,3): the shared edge
    // has support 2 (τ₀ = 4) but both its triangles lean on τ=3
    // partners, so one h-index round pulls it down to 3
    val out = collect(Trussness.run(spark,
      edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)),
      numPartitions = 4))
    assert(out.values.toSet == Set(3L))
    assert(out.size == 5)
  }

  test("trussness >= k agrees with the k-truss peel on an arithmetic graph") {
    val n = 300L
    val base = spark.range(n).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(9L)) =!= 0)
    def rule(m: Long, c: Long) =
      base.select(col("a").as("src"),
        pmod(col("a") * 3 + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(n)).as("dst"))
    val sym = GraphOps.symmetrize(
      rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
        .filter(col("src") =!= col("dst")).distinct())

    val tau = Trussness.run(spark, sym, numPartitions = 4).cache()
    for (k <- Seq(3, 4)) {
      val peel = KTruss.run(spark, sym, k, numPartitions = 4)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaTau = tau.filter(col("trussness") >= k)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaTau == peel, s"k=$k mismatch")
    }
    tau.unpersist()
  }
}

package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TrustRank and spam mass (Gyöngyi, Garcia-Molina & Pedersen,
  * "Combating Web Spam with TrustRank", VLDB 2004) — the classic
  * seed-propagation defense for a link graph: rank once with uniform
  * teleport (PageRank), once with teleport restricted to a trusted
  * seed set (TrustRank = personalized PageRank over the seeds), and
  * read the gap. A vertex whose rank collapses when teleport mass is
  * confined to trusted pages earns its rank from link structure the
  * trusted region never endorses — the spam-farm signature.
  *
  *   spam mass      M(v)  = PR(v) − TR(v)
  *   relative mass  M̃(v) = M(v) / PR(v)   (→ 1 pure spam support,
  *                                          ≤ 0 trust-dominated)
  *
  * Pure composition of two [[PageRank]] runs (same superstep budget
  * each) plus one vertex-scale join — no new iteration machinery. PR
  * and TR are rounded to 6dp BEFORE the subtraction so the derived
  * columns are bit-reproducible across engines (both differences and
  * the division then operate on identical IEEE doubles); PR ≥ (1−d)/n
  * > 0 keeps the relative mass total.
  */
object TrustRank {

  /** @param edges directed (src, dst)
    * @param trusted one column `id` — the trusted seed set (dedup'd by
    *                PageRank's personalization path)
    * @return (id, pr, trust, mass, rel_mass), doubles rounded to 6dp
    */
  def spamMass(spark: SparkSession,
               edges: DataFrame,
               trusted: DataFrame,
               numPartitions: Int = 32,
               maxIter: Int = 5,
               damping: Double = 0.85): DataFrame = {
    val pr = PageRank.run(spark, edges, numPartitions, damping = damping,
      tol = 0.0, maxIter = maxIter).ranks
    val tr = PageRank.run(spark, edges, numPartitions, damping = damping,
      tol = 0.0, maxIter = maxIter, seeds = Some(trusted)).ranks
    pr.select(col("id"), round(col("rank"), 6).as("pr"))
      .join(tr.select(col("id"), round(col("rank"), 6).as("trust")),
        Seq("id"), "left")
      .select(col("id"), col("pr"),
        coalesce(col("trust"), lit(0.0)).as("trust"))
      .select(col("id"), col("pr"), col("trust"),
        round(col("pr") - col("trust"), 6).as("mass"),
        round((col("pr") - col("trust")) / col("pr"), 6).as("rel_mass"))
  }
}

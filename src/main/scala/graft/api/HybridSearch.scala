package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim
import graft.text.Fulltext

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of the BM25 term ranking (S7) and the cosine vector ranking (S6) —
  * the retrieval surface a GraphRAG read API serves when a query has
  * both a keyword and an embedding form.
  *
  * score(d) = Σ_sources 1 / (RrfK + rank_source(d)), missing source →
  * 0 contribution. Rank-based fusion needs no score calibration
  * between BM25 and cosine, and stays deterministic: both source
  * rankings tie-break on doc id, the fused ranking on (score, id).
  *
  * Scale: BM25 touches only the query terms' postings; the vector
  * side is one corpus pass ending in a bounded top-k; fusion then
  * joins two ≤kSource-row frames — nothing wide after the scans.
  */
object HybridSearch {

  val RrfK = 60

  /** @param queryVecId id of the embedding row serving as the query
    *   vector (kept as a table reference, not a literal, so the DuckDB
    *   twin reads the identical floats)
    */
  def search(docs: DataFrame, emb: DataFrame, terms: Seq[String],
             queryVecId: Long, k: Int = 10, kSource: Int = 20): DataFrame = {
    val bm = Fulltext.search(docs, terms, kSource)
      .select(col("doc_id"), col("rank").as("brank"))

    val qv = broadcast(emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv")))
    // the rank window runs AFTER the limit — ≤ kSource rows, driver-light
    val vec = emb.crossJoin(qv)
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id").as("doc_id"),
        round(cosine_sim(col("qv"), col("embedding")), 5).as("vscore"))
      .orderBy(col("vscore").desc, col("doc_id")).limit(kSource)
      .withColumn("vrank", row_number().over(
        Window.orderBy(col("vscore").desc, col("doc_id"))))
      .select(col("doc_id"), col("vrank"))

    bm.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("brank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vrank")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
  }
}

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

  /** MMR diversification (Maximal Marginal Relevance, Carbonell–
    * Goldstein 1998) of a retrieved candidate page: greedily pick
    *   argmax_c  num·rel(c) − (den − num)·max_{s ∈ selected} sim(c, s)
    * so near-duplicate hits stop crowding the top of the answer. ALL
    * arithmetic is exact BIGINT: relevance and pairwise cosines are
    * integerized at 5 decimal places (the proven cosine-parity grain)
    * before the greedy loop, λ is the rational num/den, and ties break
    * on the smaller id — bit-reproducible and engine-replayable, no fp
    * comparison anywhere in the selection.
    *
    * Scale contract: this reranks a retrieved PAGE (≤ `maxCandidates`
    * rows), not a corpus — candidate generation is the distributed
    * part (bruteForceTopK / IVF / BM25 / RRF upstream). Pairwise sims
    * are computed distributed (one broadcast self-join of the candidate
    * frame through the codegen'd cosine kernel); the greedy loop runs
    * on the collected integer tables, O(k·m).
    *
    * @param candidates (id, rel DOUBLE, embedding) — rel in [-1, 1]
    *                   (a cosine or any score on that scale)
    * @return (rank, id, mmr_score) — mmr_score in the den-scaled
    *         5dp integer units of the selection
    */
  def mmrRerank(spark: org.apache.spark.sql.SparkSession,
                candidates: DataFrame, k: Int,
                lambdaNum: Long = 7, lambdaDen: Long = 10,
                maxCandidates: Int = 2048): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda must be a fraction in [0,1], got $lambdaNum/$lambdaDen")
    val cand = candidates
      .select(col("id"),
        round(col("rel") * 100000).cast("long").as("reli"), col("embedding"))
      .localCheckpoint(true)
    val rels = cand.select(col("id"), col("reli"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(rels.size <= maxCandidates,
      s"${rels.size} candidates exceed maxCandidates=$maxCandidates — " +
        "mmrRerank is a page reranker; narrow upstream")
    val sims = cand.as("a")
      .join(broadcast(cand.as("b")), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("ai"), col("b.id").as("bi"),
        round(cosine_sim(col("a.embedding"), col("b.embedding")) * 100000)
          .cast("long").as("si"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val remaining = scala.collection.mutable.Set(rels.keySet.toSeq: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.toSeq.map { c =>
        val penalty =
          if (selected.isEmpty) 0L
          else selected.map { case (s, _) => sims((c, s)) }.max
        c -> (lambdaNum * rels(c) - (lambdaDen - lambdaNum) * penalty)
      }
      val (win, score) = scored.minBy { case (id, sc) => (-sc, id) }
      selected += ((win, score))
      remaining -= win
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, sc), i) => (i + 1L, id, sc) }.toSeq
      .toDF("rank", "id", "mmr_score")
  }
}

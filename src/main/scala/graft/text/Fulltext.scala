package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7: the fulltext index path (graph/constraints.py:263-286 — Lucene
  * BM25 over Chunk.text) as DataFrames: a tokenized inverted index
  * (postings + document stats) and a BM25-scored search.
  *
  * Scoring is the standard Okapi/Lucene shape with k1 = 1.2, b = 0.75:
  *   idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   score(t, d) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * Scale shape: postings build is ONE explode + groupBy (term, doc)
  * shuffle; document frequencies are a map-side-combined groupBy on
  * term; a search touches only the query terms' postings (the filter
  * pushes into the postings scan), never the corpus.
  */
object Fulltext {

  val K1 = 1.2
  val B = 0.75

  private def toks(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => t =!= "")

  /** Inverted index: (term, doc_id, tf). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document token length (dl). */
  def docLengths(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), size(toks(col(textCol))).as("dl"))

  /** BM25 top-k search for a bag of query terms. Scores rounded to 4dp
    * before ranking, ties broken on doc_id — deterministic across
    * engines. Returns (doc_id, score, rank).
    */
  def search(docs: DataFrame, terms: Seq[String], k: Int = 10,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val p = postings(docs, idCol, textCol)
    val dls = docLengths(docs, idCol, textCol)
    // N and avgdl as a 1-row broadcast dimension
    val stats = broadcast(dls.agg(
      count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")))
    val dfs = p.filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

    val scored = p.filter(col("term").isin(terms: _*))
      .join(broadcast(dfs), Seq("term"))
      .join(dls, Seq("doc_id"))
      .crossJoin(stats)
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
          .as("s"))

    scored.groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
  }
}

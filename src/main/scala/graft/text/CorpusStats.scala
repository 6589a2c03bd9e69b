package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling for a training-data pipeline: the summary tables
  * a data card needs before any curation decision. Each is one
  * map-side-combinable aggregation pass; the only wide row set is the
  * token-frequency table, whose shuffle key is the token itself.
  */
object CorpusStats {

  /** Global vocabulary head: top-k tokens by total occurrences, with
    * document frequency. Tie-broken on token for determinism. The
    * groupBy is map-side combinable (token keys), and only the k
    * survivors reach the driver-side sort — at 100 TB the token table
    * is ~√corpus and the final top-k is a single reduction.
    */
  def vocabTopK(docs: DataFrame, k: Int = 50,
                textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("occurrences"),
        count_distinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("tok"))
      .limit(k)

  /** Per-language profile: doc count, token sum, mean length (2dp). */
  def langProfile(docs: DataFrame, textCol: String = "text",
                  langCol: String = "lang"): DataFrame =
    docs.groupBy(langCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        round(avg(length(col(textCol))), 2).as("avg_chars"))

  /** Document-length histogram over fixed-width char buckets. */
  def lengthHistogram(docs: DataFrame, bucketWidth: Int = 100,
                      textCol: String = "text"): DataFrame =
    docs.groupBy((length(col(textCol)).cast("long") / bucketWidth)
        .cast("long").multiply(bucketWidth).as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
}

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
  /** Discrete power-law exponent of the token-frequency distribution —
    * the Clauset–Shalizi–Newman MLE at a fixed cutoff:
    * α̂ = 1 + n / Σ_{f ≥ fmin} ln(f / (fmin − ½)), the data-card
    * heavy-tail summary (natural text sits near α ≈ 2; a flat or
    * ultra-steep fit flags synthetic or template-dominated corpora).
    * One token-frequency shuffle + one map-side-combinable aggregate;
    * the ln is transcendental, so this stays spec-gated rather than
    * hash-oracled (the PMI libm-ulp lesson).
    *
    * @return one row (n_types, fmin, alpha) — alpha null when no
    *   frequency reaches fmin
    */
  def zipfAlpha(docs: DataFrame, fmin: Long = 5L,
                textCol: String = "text"): DataFrame = {
    val freq = docs
      .select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .select(col("f"))
    zipfAlphaFromFreq(freq, fmin)
  }

  /** The MLE finish over an already-computed frequency column `f`. */
  def zipfAlphaFromFreq(freq: DataFrame, fmin: Long = 5L): DataFrame = {
    require(fmin >= 1, s"fmin must be >= 1, got $fmin")
    freq.filter(col("f") >= fmin)
      .agg(count(lit(1)).as("n_types"),
        sum(log(col("f").cast("double") / (fmin - 0.5))).as("s"))
      .select(col("n_types"), lit(fmin).as("fmin"),
        when(col("n_types") > 0 && col("s") > 0,
          round(lit(1.0) + col("n_types") / col("s"), 6))
          .otherwise(lit(null).cast("double")).as("alpha"))
  }

  def lengthHistogram(docs: DataFrame, bucketWidth: Int = 100,
                      textCol: String = "text"): DataFrame =
    docs.groupBy((length(col(textCol)).cast("long") / bucketWidth)
        .cast("long").multiply(bucketWidth).as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
}

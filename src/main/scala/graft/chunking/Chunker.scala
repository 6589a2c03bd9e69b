package graft.chunking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic document chunking with the reference's parameters
  * (chunking/config.py:40-45): window 512 chars, overlap 64 (step 448),
  * split threshold 1500, minimum chunk 100. Texts at or under the
  * threshold stay whole; longer texts become overlapping windows; a
  * trailing window shorter than 100 chars is dropped (the reference's
  * min-chunk rule; its content is already covered by the 64-char
  * overlap of the previous window).
  *
  * chunk_id = {article_id}_chunk_{index:04d} (validation/fixes.py:488-494).
  * Pure column expressions — one `posexplode` over a position sequence.
  */
object Chunker {

  val WindowSize = 512
  val Overlap = 64
  val Step: Int = WindowSize - Overlap // 448
  val SplitThreshold = 1500
  val MinChunk = 100

  /** @param docs (idCol, textCol) table
    * @return (article_id, chunk_id, chunk_index, text, n_chars)
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val len = length(col(textCol))
    val nWin = when(len <= SplitThreshold, lit(1))
      .otherwise(ceil((len - Overlap).cast("double") / Step).cast("int"))
    docs
      .select(col(idCol).cast("string").as("article_id"), col(textCol).as("__text"),
        posexplode(sequence(lit(0), nWin - 1)).as(Seq("chunk_index", "__w")))
      .select(col("article_id"), col("chunk_index"),
        when(length(col("__text")) <= SplitThreshold, col("__text"))
          .otherwise(substring(col("__text"),
            (col("chunk_index") * Step + 1).cast("int"), lit(WindowSize))).as("text"))
      .filter(col("chunk_index") === 0 || length(col("text")) >= MinChunk)
      .select(col("article_id"),
        concat(col("article_id"), lit("_chunk_"),
          lpad(col("chunk_index").cast("string"), 4, "0")).as("chunk_id"),
        col("chunk_index"), col("text"), length(col("text")).as("n_chars"))
  }

  /** M-11: drop degenerate chunks (< 100 chars, no MENTIONED_IN edge)
    * then W-1: re-assign a dense sequential index per article and
    * re-synthesize chunk ids (validation/fixes.py:35-94, 137-146).
    */
  def repairChunks(chunks: DataFrame, mentionedIn: DataFrame): DataFrame = {
    val kept = chunks
      .join(mentionedIn.select(col("chunk_id")).distinct()
        .withColumn("__hasMention", lit(true)), Seq("chunk_id"), "left")
      .filter(col("n_chars") >= MinChunk || col("__hasMention").isNotNull)
      .drop("__hasMention")
    val w = Window.partitionBy(col("article_id")).orderBy(col("chunk_index"))
    kept
      .withColumn("chunk_index", row_number().over(w) - 1)
      .withColumn("chunk_id",
        concat(col("article_id"), lit("_chunk_"),
          lpad(col("chunk_index").cast("string"), 4, "0")))
  }

  /** J-4: MENTIONED_IN backfill — word-boundary text match of Standard/
    * Industry entity names (length ≥ 4) inside chunk text
    * (mentioned_in_backfill.py:72-104). The entity side is tiny →
    * broadcast; the chunk side streams.
    */
  def backfillMentionedIn(chunks: DataFrame, entities: DataFrame): DataFrame = {
    val terms = broadcast(
      entities.filter(col("label").isin("Standard", "Industry") &&
          col("name").isNotNull && length(col("name")) >= 4)
        .select(col("id").as("entity_id"), col("name")).distinct())
    chunks.crossJoin(terms)
      .filter(concat(lit(" "), lower(col("text")), lit(" "))
        .contains(concat(lit(" "), lower(col("name")), lit(" "))))
      .select(col("entity_id"), col("chunk_id"))
      .distinct()
  }
}

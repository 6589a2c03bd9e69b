package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream.
  *
  * The reference is batch-only (SURVEY.md §2.9) — these cover the
  * engine-side streaming surface: a watermarked windowed aggregation
  * (see SparkEntry "stream_windowed_agg") and a custom-state operator
  * via `mapGroupsWithState` (the KeyValueGroupedDataset state API).
  */
object StreamingOps {

  final case class Ev(user_id: Long, sec: Long, value: Double)
  final case class UserState(n: Long, totalMicros: Long, lastSec: Long)
  final case class UserAgg(user_id: Long, n: Long, totalMicros: Long, last_sec: Long)

  /** Streaming exact dedup: watermark-bounded `dropDuplicatesWithin
    * Watermark` over a duplicated event stream — the streaming twin of
    * Dedup.exactDedup. State holds each key only within the watermark
    * horizon, so it's bounded at 100 TB stream scale (plain
    * dropDuplicates would pin every key forever). The caller stages a
    * directory whose files contain duplicates; output carries each
    * event_id exactly once with identical column values, so the DuckDB
    * batch oracle is just the distinct source table.
    */
  def streamDedup(spark: SparkSession, eventsDir: String, queryName: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val q = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming graph ingestion: running degree counts over an edge
    * STREAM — both endpoints exploded, stateful count per vertex,
    * Complete-mode memory sink so the table always holds the current
    * snapshot. The streaming state is one long per vertex (bounded by
    * |V|, not by stream length), which is why running degrees — unlike,
    * say, running triangle counts — is the incremental statistic you
    * keep ON the ingest path at 100 TB; after the stream drains the
    * snapshot equals the batch degree aggregation, which is exactly
    * what the DuckDB oracle computes.
    */
  def streamingDegrees(spark: SparkSession, edgesDir: String,
                       queryName: String): DataFrame = {
    val schema = spark.read.parquet(edgesDir).schema
    val q = spark.readStream.schema(schema).parquet(edgesDir)
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Streaming per-window distinct counts at SKETCH cost: the KMV
    * aggregate ([[graft.functions.KmvSketch]]) as streaming state — at
    * most k longs per window, instead of the one-entry-per-distinct-key
    * state a streaming `count_distinct` would pin (unbounded at 100 TB
    * stream scale when keys are urls/ids). Exact while a window's true
    * cardinality stays below k; past k the KMV estimator (k−1)/u₍k₎
    * takes over (the property [[graft.algo.Hyperball]] rides). The
    * driver query pins k = 4096 over ≤ 150 users, so the Complete-mode
    * snapshot equals batch `count(DISTINCT)` — exactly what the DuckDB
    * oracle computes.
    */
  def streamingWindowDistinct(spark: SparkSession, eventsDir: String,
                              queryName: String, k: Int = 4096): DataFrame = {
    import graft.functions.{kmv_min, mix64}
    val schema = spark.read.parquet(eventsDir).schema
    val q = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", "10 minutes")
      .groupBy(window(col("ets"), "6 hours"))
      .agg(kmv_min(mix64(col("user_id")), k).as("sk"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        size(col("sk")).cast("long").as("n_distinct"))
  }

  /** Per-user running aggregate with explicit keyed state: count, exact
    * running total (scaled-long cents to stay engine-reproducible) and
    * last-seen event time. Update-mode memory sink; with a single input
    * batch the result equals the batch groupBy — which is exactly what
    * the DuckDB oracle computes.
    */
  def runningUserAgg(spark: SparkSession, eventsDir: String, queryName: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsDir).schema

    val evs = spark.readStream.schema(schema).parquet(eventsDir)
      .select(col("user_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("sec"),
        col("value"))
      .as[Ev]

    val updated = evs.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
          var n = prev.n
          var total = prev.totalMicros
          var last = prev.lastSec
          rows.foreach { e =>
            n += 1
            // exact micro-unit accumulation, HALF_UP like a DECIMAL(30,6)
            // cast — order-independent and engine-reproducible
            total += BigDecimal(e.value)
              .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
              .*(BigDecimal(1000000)).toLongExact
            last = math.max(last, e.sec)
          }
          state.update(UserState(n, total, last))
          UserAgg(user, n, total, last)
      }

    val q = updated.toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName).start()
    q.processAllAvailable()
    q.stop()

    spark.table(queryName)
      .select(col("user_id"), col("n"),
        round(col("totalMicros") / 1e6, 4).as("total"), col("last_sec"))
  }

  /** Continuous graph ingestion with INCREMENTAL component
    * maintenance: each micro-batch of edges folds into the running
    * labeling via [[graft.algo.ConnectedComponents.incremental]] —
    * the prior labeling contracts to |V| star edges regardless of
    * historic edge volume, so per-batch work is
    * O(stars + Δ) · log² n, never a recount of the history. The
    * streaming form of the snapshot-maintenance pair (snapshotDiff →
    * incremental CC) and the shape an entity-resolution pipeline
    * runs on a live edge feed.
    *
    * `maxFilesPerTrigger = 1` forces one micro-batch per file so the
    * incremental path genuinely exercises across batches (one big
    * batch would degenerate to a fresh run). Because incremental ≡
    * fresh on any batch split (IncrementalSpec), the final labeling
    * equals the batch CC of the union — which is exactly what the
    * DuckDB twin checks.
    */
  def streamingIncrementalCC(spark: SparkSession, edgesDir: String,
                             queryName: String,
                             numPartitions: Int = 8): DataFrame = {
    import graft.algo.{ConnectedComponents, Superstep}
    val schema = spark.read.parquet(edgesDir).schema
    var labels: DataFrame = spark.emptyDataFrame
      .select(lit(0L).as("id"), lit(0L).as("component")).limit(0)
      .localCheckpoint(true)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(edgesDir)
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = ConnectedComponents
          .incremental(spark, labels, batch.select(col("src"), col("dst")),
            numPartitions)
          .localCheckpoint(true)
        Superstep.freeCheckpoint(labels)
        labels = next
        ()
      }
      .queryName(queryName).start()
    q.processAllAvailable()
    q.stop()
    labels
  }
}

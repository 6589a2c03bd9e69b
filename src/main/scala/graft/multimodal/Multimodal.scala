package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The real decode step (JPEG/PNG/audio codecs) is STUBBED — the
  * container ships no media libraries — behind [[FakeDecoder]], a
  * deterministic byte-level stand-in. Everything Spark-side is real and
  * tested: the schema, the binary payload handling, partition-level
  * batching via `mapPartitions` over a typed Dataset (the Scala
  * equivalent of `mapInPandas` batch shape), and the downstream feature
  * columns feeding [[graft.sim.Similarity]].
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                            width: Int, height: Int, codec: String)
  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Int,
                                 histogram: Array[Double], frames: Int)

  /** STUB decoder: a deterministic fake. A production build would swap
    * this object for a codec-backed implementation with the same
    * signature; nothing else changes.
    */
  object FakeDecoder {
    /** 16-bin byte histogram, L1-normalized — stands in for decoded
      * pixel/sample statistics.
      */
    def features(media: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      var i = 0
      while (i < media.length) { h((media(i) & 0xFF) >> 4) += 1.0; i += 1 }
      val n = math.max(media.length, 1).toDouble
      h.map(_ / n)
    }

    /** Fake frame sampling: one frame per 64 bytes, at least 1. */
    def frameCount(media: Array[Byte]): Int = math.max(media.length / 64, 1)
  }

  /** Synthesize a media table from documents: payload = UTF-8 bytes of
    * the text (deterministic), metadata derived from doc_id.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        pmod(col("doc_id"), lit(3)).cast("int") + 1).as("kind"),
      encode(col("text"), "UTF-8").as("media"),
      (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
      (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
      lit("fake/v1").as("codec"))

  /** Batch feature extraction: one decoder invocation per row, executed
    * partition-at-a-time (no per-row task overhead, no driver collect).
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.doc_id, r.kind, r.media.length,
          FakeDecoder.features(r.media),
          if (r.kind == "video") FakeDecoder.frameCount(r.media) else 1)
      }
    }
  }
}

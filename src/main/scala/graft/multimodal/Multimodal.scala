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

  /** REAL image decode path — no native codecs required: PNG encode /
    * decode through the JDK's own `javax.imageio` (the ImageIO PNG
    * plugin ships with every JRE). PNG is lossless for RGB, so a
    * pixel formula → encode → binary column → decode → histogram
    * round-trip is exact and therefore oracle-replayable: DuckDB
    * recomputes the same histogram analytically from the formula
    * while Spark goes through actual PNG bytes. This retires the
    * FakeDecoder stub for images; audio/video remain stubbed (the
    * container genuinely has no audio/video codecs).
    */
  object PngCodec {
    /** Deterministic grayscale test card: pixel (x, y) of doc d has
      * intensity (d·7 + x·13 + y·31) mod 256.
      */
    def encode(docId: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = ((docId * 7 + x * 13 + y * 31) % 256).toInt
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode a PNG and return (width, height, 16-bin L1-normalized
      * intensity histogram over the blue channel).
      */
    def features(media: Array[Byte]): (Int, Int, Array[Double]) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(media))
      require(img != null, "undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Double](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          hist((img.getRGB(x, y) & 0xFF) >> 4) += 1.0
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      (w, h, hist.map(_ / n))
    }
  }

  final case class PngRow(doc_id: Long, media: Array[Byte])
  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
                               n_bytes: Int, histogram: Array[Double])

  /** Synthesize one real PNG per document (doc-derived dimensions),
    * encoded partition-at-a-time on the executors — the write half of
    * the decode test, and the binary-column ingestion shape a media
    * pipeline has at scale (opaque bytes + typed metadata).
    */
  def pngTable(docs: DataFrame): Dataset[PngRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { d =>
        PngRow(d, PngCodec.encode(d, 16 + (d % 16).toInt, 16 + (d % 8).toInt))
      }
    }
  }

  /** Batch PNG decode + featurize, partition-at-a-time. */
  def extractPngFeatures(media: Dataset[PngRow]): Dataset[PngFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, hist) = PngCodec.features(r.media)
        PngFeatures(r.doc_id, w, h, r.media.length, hist)
      }
    }
  }

  /** REAL audio decode path — no native codecs required: WAV/PCM
    * encode / decode through the JDK's own `javax.sound.sampled`
    * (the WAVE file reader/writer ships with every JRE). 16-bit PCM
    * is lossless, so a sample formula → encode → binary column →
    * decode → statistics round-trip is exact and oracle-replayable:
    * DuckDB recomputes the same sample statistics analytically from
    * the formula while Spark goes through actual RIFF/WAVE bytes.
    * This retires the FakeDecoder stub for audio the same way
    * [[PngCodec]] retired it for images; only video remains stubbed
    * (the container genuinely has no video codecs).
    */
  object WavCodec {
    /** Deterministic mono test tone: sample i of doc d is
      * ((d·31 + i·17) mod 65536) − 32768, 16-bit signed PCM.
      */
    def encode(docId: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        val v = (((docId * 31 + i.toLong * 17) % 65536) - 32768).toInt
        pcm(2 * i) = (v & 0xFF).toByte          // little-endian
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV payload and return (sampleRate, nSamples, exact
      * sample sum, 16-bin histogram counts over (sample+32768)>>12).
      */
    def features(media: Array[Byte]): (Int, Int, Long, Array[Long]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected format $fmt")
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < n) {
        // sign-extend the high byte, mask the low byte
        val v = if (fmt.isBigEndian)
          (bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xFF)
        else
          (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xFF)
        sum += v
        hist((v + 32768) >> 12) += 1L
        i += 1
      }
      (fmt.getSampleRate.toInt, n, sum, hist)
    }
  }

  final case class WavRow(doc_id: Long, media: Array[Byte])
  final case class WavFeatures(doc_id: Long, sample_rate: Int, n_samples: Int,
                               n_bytes: Int, checksum: Long, histogram: Array[Long])

  /** Synthesize one real WAV per document (doc-derived length and
    * rate), encoded partition-at-a-time on the executors.
    */
  def wavTable(docs: DataFrame): Dataset[WavRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { d =>
        WavRow(d, WavCodec.encode(d, 256 + (d % 128).toInt,
          8000 + (d % 4).toInt * 2000))
      }
    }
  }

  /** Batch WAV decode + featurize, partition-at-a-time. */
  def extractWavFeatures(media: Dataset[WavRow]): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (sr, n, sum, hist) = WavCodec.features(r.media)
        WavFeatures(r.doc_id, sr, n, r.media.length, sum, hist)
      }
    }
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

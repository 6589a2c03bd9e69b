package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.WavCodec

/** WAV round-trip: encode through javax.sound.sampled, decode, and
  * check every statistic against the analytic sample formula —
  * lossless 16-bit PCM must reproduce the exact checksum and bins.
  */
class WavCodecSpec extends AnyFunSuite {

  test("encode→decode round-trip matches the analytic sample formula") {
    for (d <- Seq(0L, 1L, 7L, 63L, 199L)) {
      val n = 256 + (d % 128).toInt
      val sr = 8000 + (d % 4).toInt * 2000
      val bytes = WavCodec.encode(d, n, sr)
      // RIFF header present
      assert(bytes.take(4).map(_.toChar).mkString === "RIFF")
      val (gotSr, gotN, sum, hist) = WavCodec.features(bytes)
      assert(gotSr === sr)
      assert(gotN === n)
      val samples = (0 until n).map(i => (((d * 31 + i * 17) % 65536) - 32768).toInt)
      assert(sum === samples.map(_.toLong).sum)
      val refHist = new Array[Long](16)
      samples.foreach(v => refHist((v + 32768) >> 12) += 1L)
      assert(hist.toSeq === refHist.toSeq)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.CorpusStats

/** Corpus profiling goldens on a tiny fixture. */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat", "en"),
    (2L, "the the dog", "en"),
    (3L, "le chat", "fr")
  ).toDF("doc_id", "text", "lang")

  test("vocabTopK counts occurrences and doc frequency, tie-breaks on token") {
    val rows = CorpusStats.vocabTopK(docs, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head == (("the", 3L, 2L)))
    // occurrences=1 tokens tie → lexicographic: cat before chat
    assert(rows(1) == (("cat", 1L, 1L)) && rows(2) == (("chat", 1L, 1L)))
  }

  test("langProfile aggregates per stratum") {
    val m = CorpusStats.langProfile(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("en") == ((2L, 6L)) && m("fr") == ((1L, 2L)))
  }

  test("lengthHistogram buckets by char count") {
    val m = CorpusStats.lengthHistogram(docs, bucketWidth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // lengths: 11, 11, 7 → buckets 10→2 docs, 0→1 doc
    assert(m == Map(10L -> 2L, 0L -> 1L))
  }

  test("zipfAlpha recovers the exponent of an exact planted power law") {
    // plant rank-slope s = 2 (f_r = 1e6/r²): the frequency
    // DISTRIBUTION then follows a power law with exponent
    // alpha = 1 + 1/s = 1.5 — the quantity the CSN MLE estimates
    val freq = (1 to 400).map(r => math.round(1e6 / (r.toDouble * r)))
      .toDF("f")
    val row = graft.text.CorpusStats.zipfAlphaFromFreq(freq, fmin = 5L).head()
    val alpha = row.getDouble(2)
    assert(math.abs(alpha - 1.5) < 0.1, s"alpha = $alpha")
  }

  test("zipfAlpha matches a sequential MLE on the corpus path") {
    val body = (0 until 300).map(i => "w" + (math.sqrt(i).toInt)).mkString(" ")
    val d = Seq((0L, body)).toDF("doc_id", "text")
    val row = graft.text.CorpusStats.zipfAlpha(d, fmin = 3L).head()
    // sequential reference
    val counts = body.split(" ").groupBy(identity).map(_._2.length.toLong)
      .filter(_ >= 3L).toSeq
    val want = 1.0 + counts.size / counts.map(f => math.log(f / 2.5)).sum
    assert(math.abs(row.getDouble(2) - math.rint(want * 1e6) / 1e6) < 1e-9)
    assert(row.getLong(0) === counts.size.toLong)
  }

  test("zipfAlpha null when nothing reaches fmin") {
    val d = Seq((0L, "each word unique here")).toDF("doc_id", "text")
    assert(graft.text.CorpusStats.zipfAlpha(d, fmin = 2L).head().isNullAt(2))
  }
}

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
}

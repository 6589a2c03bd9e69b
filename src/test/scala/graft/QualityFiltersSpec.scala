package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.QualityFilters

/** Repetition filters + PII redaction: hand-computed goldens. */
class QualityFiltersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repetitionMetrics: dup lines, template bigrams, symbol spam") {
    val docs = Seq(
      (1L, "one two three four\none two three four\nunique line"), // 2/3 dup lines
      (2L, "spam spam spam spam spam"),                            // top bigram 4/4
      (3L, "# # # # some words here"),                             // 4 syms / 7 words
      (4L, "a perfectly ordinary sentence with no repetition at all")
    ).toDF("doc_id", "text")
    val m = QualityFilters.repetitionMetrics(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toMap
    assert(m(1L)._1 == 0.666667 && m(1L)._4 == 1)
    assert(m(2L)._2 == 1.0 && m(2L)._4 == 1)        // "spam spam" fills all slots
    assert(m(3L)._3 == 0.571429 && m(3L)._4 == 1)
    assert(m(4L) == ((0.0, 0.125, 0.0, 0)))         // 1/8 bigram max, below 0.18
  }

  test("redactPii masks emails and phones, counts both") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@sub.example.org thanks"),
      (2L, "call +1 555-123-4567 or 555 987 6543 now"),
      (3L, "no pii here"),
      (4L, "reach me: 555-123-4567x@corp.com ok") // phone-shaped local part
    ).toDF("doc_id", "text")
    val out = QualityFilters.redactPii(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((1L, 0L, "mail me at [EMAIL] thanks")))
    assert(out(2L) == ((0L, 2L, "call +1 [PHONE] or [PHONE] now")))
    assert(out(3L) == ((0L, 0L, "no pii here")))
    // the phone inside the email is swallowed by [EMAIL]; counting it
    // would claim an unredacted phone that isn't there
    assert(out(4L) == ((1L, 0L, "reach me: [EMAIL] ok")))
  }
}

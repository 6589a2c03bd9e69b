package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Curation

/** Curation operators: decontamination, sequence packing, stratified
  * sampling — invariants plus hand-computed goldens on tiny fixtures.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ── decontamination ────────────────────────────────────────────────

  test("decontaminate flags exact and partial 5-gram overlap, not clean docs") {
    val held = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),    // full overlap: 2 grams
      (2L, "x alpha beta gamma delta epsilon y"),     // 1 shared gram
      (3L, "totally unrelated words in this doc ok"), // clean
      (4L, "too short")                               // < 5 tokens → no grams
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, held, n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L) == (2L, 1))
    assert(out(2L) == (1L, 1))
    assert(out(3L) == (0L, 0))
    assert(out(4L) == (0L, 0))
    assert(out.size == 4) // one row per training doc, clean ones included
  }

  // ── sequence packing ───────────────────────────────────────────────

  test("packSequences: pack boundaries at the budget, straddlers stay put") {
    // 6 docs × 10 tokens, budget 25 → prefixes 0,10,20,30,40,50
    val docs = (0L until 6L).map(i =>
      (i, Seq.fill(10)(s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Curation.packSequences(docs, budget = 25, bucketSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) == (0L, 0L))  // prefix 0
    assert(out(1L) == (0L, 10L)) // prefix 10
    assert(out(2L) == (0L, 20L)) // prefix 20 — straddles, begins in pack 0
    assert(out(3L) == (1L, 5L))  // prefix 30
    assert(out(4L) == (1L, 15L)) // prefix 40
    assert(out(5L) == (2L, 0L))  // prefix 50
  }

  test("packSequences invariants hold regardless of bucketSize") {
    val docs = (0L until 200L).map(i =>
      (i * 3, Seq.fill((i % 7 + 1).toInt)("w").mkString(" "))).toDF("doc_id", "text")
    val a = Curation.packSequences(docs, budget = 32, bucketSize = 8)
      .orderBy("doc_id").collect()
    val b = Curation.packSequences(docs, budget = 32, bucketSize = 1000)
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // bucketSize is plan-only
    // pack ids nondecreasing in doc order; offsets within budget
    val packs = a.map(_.getLong(2))
    assert(packs.zip(packs.tail).forall { case (p, q) => p <= q })
    assert(a.forall(r => r.getLong(3) >= 0 && r.getLong(3) < 32))
  }

  // ── stratified sampling ────────────────────────────────────────────

  test("stratifiedSample: deterministic, rate-proportional, stratum-scoped") {
    val docs = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "en" else "zz")).toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5)
    val s1 = Curation.stratifiedSample(docs, rates, defaultRate = 0.0, salt = 7L)
    val s2 = Curation.stratifiedSample(docs, rates, defaultRate = 0.0, salt = 7L)
    assert(s1.orderBy("doc_id").collect().toSeq ==
      s2.orderBy("doc_id").collect().toSeq) // exact reproducibility
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("zz")) // defaultRate 0 drops the stratum
    val en = byLang.getOrElse("en", 0L).toDouble / 2000.0
    assert(en > 0.4 && en < 0.6, s"en keep rate $en") // ≈ 0.5
    // different salt → different sample
    val s3 = Curation.stratifiedSample(docs, rates, defaultRate = 0.0, salt = 8L)
    assert(s3.orderBy("doc_id").collect().toSeq !=
      s1.orderBy("doc_id").collect().toSeq)
  }

  test("resampleMixture: expected multiplier per stratum, dense copy_idx") {
    val docs = (0L until 3000L).map(i =>
      (i, Seq("up", "keep", "down")((i % 3).toInt))).toDF("doc_id", "lang")
    val out = Curation.resampleMixture(docs,
      weights = Map("up" -> 2.5, "down" -> 0.5), defaultWeight = 1.0, salt = 3L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per stratum: up ≈ 2500, keep = exactly 1000, down ≈ 500
    assert(counts("keep") == 1000L)
    assert(counts("up") > 2300 && counts("up") < 2700, s"up=${counts("up")}")
    assert(counts("down") > 400 && counts("down") < 600, s"down=${counts("down")}")
    // per-doc copies are 0..n-1 with no gaps
    val byDoc = out.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
        .as("n"),
        org.apache.spark.sql.functions.max("copy_idx").as("mx"))
      .collect()
    assert(byDoc.forall(r => r.getLong(2) == r.getLong(1) - 1))
  }

  // ── temperature mixture weights ────────────────────────────────────

  test("temperatureWeights: sqrt smoothing boosts tails, conserves mass") {
    // 90/10 split: q ∝ sqrt(p) → tail boosted ~2.4x, head trimmed
    val docs = ((1L to 90L).map(i => (i, "en")) ++ (91L to 100L).map(i => (i, "fr")))
      .toDF("doc_id", "lang")
    val w = Curation.temperatureWeights(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (sq9, sq1) = (math.sqrt(0.9), math.sqrt(0.1))
    val z = sq9 + sq1
    assert(math.abs(w("fr")._3 - sq1 / z) < 1e-12)
    assert(math.abs(w("fr")._4 - (sq1 / z) / 0.1) < 1e-12)
    assert(w("fr")._4 > 2.0 && w("en")._4 < 1.0)
    // expected resampled size is conserved: Σ n·weight = N
    assert(math.abs(w.values.map(v => v._1 * v._4).sum - 100.0) < 1e-9)
  }

  test("temperatureWeights: uniform mixture is a fixed point") {
    val docs = ((1L to 50L).map(i => (i, "a")) ++ (51L to 100L).map(i => (i, "b")))
      .toDF("doc_id", "lang")
    val w = Curation.temperatureWeights(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(w.values.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  // ── repeated spans (ExactSubstr) ───────────────────────────────────

  test("repeatedSpans flags cross-doc shared windows, not unique ones") {
    val docs = Seq(
      (1L, "a b c d e f g h x"), // 2 windows; [a..h] shared with doc 2
      (2L, "a b c d e f g h y"),
      (3L, "one two three four five six seven eight nine"), // all unique
      (4L, "too short")          // < 8 tokens → zero windows
    ).toDF("doc_id", "text")
    val out = Curation.repeatedSpans(docs, n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == (2L, 1L, 0.5))
    assert(out(2L) == (2L, 1L, 0.5))
    assert(out(3L) == (2L, 0L, 0.0))
    assert(out(4L) == (0L, 0L, 0.0))
  }

  test("repeatedSpans: WITHIN-doc repetition counts (ExactSubstr semantics)") {
    val docs = Seq((3L, "p q p q p q p q p q")).toDF("doc_id", "text")
    val out = Curation.repeatedSpans(docs, n = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 7 windows, every one a repeat of "p q p q" or "q p q p"
    assert(out(3L) == (7L, 7L, 1.0))
  }

  test("repeatedSpans: stride thins the window set") {
    val docs = Seq((1L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    val s1 = Curation.repeatedSpans(docs, n = 8, stride = 1).first().getLong(1)
    val s2 = Curation.repeatedSpans(docs, n = 8, stride = 2).first().getLong(1)
    assert(s1 == 5L && s2 == 3L) // starts 0..4 vs 0,2,4
  }
}

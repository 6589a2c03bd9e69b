package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Training-data curation operators a 100 TB pipeline needs beyond
  * dedup/similarity: benchmark decontamination, sequence packing and
  * deterministic stratified sampling — all pure codegen'd column
  * expressions with exact DuckDB oracle twins.
  *
  * Scale notes (100 TB discipline):
  *  - decontamination joins the CORPUS side once against a broadcast of
  *    the (always small) held-out gram set; the only shuffle of
  *    corpus-derived rows carries matched grams, not all grams;
  *  - packing is a distributed prefix sum: per-bucket window cumsum +
  *    a bucket-offset join — no global single-partition sort;
  *  - sampling is stateless per-row arithmetic (one scan, zero shuffle).
  */
object Curation {

  /** Distinct word n-grams as space-joined strings. Documents shorter
    * than n tokens contribute no grams (standard decontamination
    * semantics — an m<n-token doc cannot contain an n-gram overlap).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val tk = TextOps.tokens(text)
    array_distinct(
      when(size(tk) >= n,
        transform(sequence(lit(0), size(tk) - n),
          i => concat_ws(" ", slice(tk, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** ── Winnowing (MOSS) fingerprint selection ───────────────────────
    * Schleimer–Wilkerson–Aiken (SIGMOD 2003) local fingerprinting:
    * hash every n-token gram, then in every window of w consecutive
    * gram hashes keep the minimum (ties → leftmost). GUARANTEE: any
    * shared run of ≥ w+n−1 tokens between two documents shares at
    * least one selected fingerprint — the density-bounded alternative
    * to `repeatedSpans`' every-window table (expected density 2/(w+1)
    * of the gram count), the standard plagiarism/overlap index shape.
    *
    * Gram hash = the position-weighted token polynomial pushed through
    * the 31-bit Knuth mixer — exact integer arithmetic both engines
    * compute (xxhash64 has no DuckDB twin); any deterministic hash
    * preserves the guarantee. The ONLY window runs per document over
    * gram positions with a fixed w-row frame (the per-vertex Pareto
    * discipline — never a global sort); at 100 TB the per-doc frames
    * parallelize across documents.
    *
    * @return (doc_id, pos, fp) — distinct selected fingerprints; pos =
    *   the gram's token offset
    */
  def winnowing(docs: DataFrame, n: Int = 5, w: Int = 4,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // token value: base-31 char polynomial reduced mod 2³¹ at every
    // step — overflow-safe for any token length in BOTH engines
    // (DuckDB BIGINT errors on overflow; Spark wraps silently) and
    // full-content entropy (first-char+length hashing tied so often
    // the winnow density blew past 2/(w+1))
    def tokVal(tok: Column): Column =
      aggregate(sequence(lit(1), length(tok)), lit(0L),
        (acc, i) => pmod(acc * 31L + ascii(tok.substr(i, lit(1))),
          lit(2147483648L)))
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), tokVal(col("tok")).as("tv"))
    // n rows per gram: token j of the gram starting at pos
    val gram = toks
      .select(col("doc_id"), col("pos"), col("tv"),
        explode(sequence(greatest(lit(0), col("pos") - (n - 1)),
          col("pos"))).as("gpos"))
      .filter(col("gpos") >= 0)
      .groupBy(col("doc_id"), col("gpos"))
      .agg(count(lit(1)).as("glen"),
        sum((col("pos") - col("gpos") + 1) * col("tv")).as("psum"))
      .filter(col("glen") === n) // full grams only
      .select(col("doc_id"), col("gpos").as("pos"),
        pmod(pmod(col("psum"), lit(2147483648L)) * lit(2654435761L),
          lit(2147483648L)).as("gh"))
    // (gh, pos) packed into one BIGINT so the frame min is a plain
    // long min with the leftmost-tie rule built in; engine-shared.
    // Field widths: gh < 2³¹, pos < 2³² — max key is exactly
    // Long.MaxValue, and pos is structurally < 2³¹ (posexplode over a
    // JVM array caps positions at Int.MaxValue), so no document length
    // can silently corrupt the pack (ADVICE r3: the old 2²¹ pos field
    // overflowed past 2,097,152 tokens — plausible at crawl scale).
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val key = col("gh") * lit(4294967296L) + col("pos")
    gram
      .select(col("doc_id"),
        min(key).over(win).as("m"),
        count(lit(1)).over(win).as("wlen"))
      .filter(col("wlen") === w) // full windows only
      .select(col("doc_id"), pmod(col("m"), lit(4294967296L)).as("pos"),
        shiftright(col("m"), 32).as("fp"))
      .distinct()
  }

  /** Cross-document overlap pairs from winnowing fingerprints — the
    * MOSS report: (doc_a, doc_b, shared_fps) for every document pair
    * sharing at least one SELECTED fingerprint. Fingerprints held by
    * more than `maxDocsPerFp` documents are dropped first — the
    * standard boilerplate filter (ubiquitous fragments: headers,
    * license text) that also bounds the pair fan-out: a fingerprint in
    * d docs emits C(d,2) ≤ C(cap,2) pairs, so the join is
    * cap-quadratic per fingerprint, never corpus-quadratic.
    */
  def winnowingMatches(fps: DataFrame, maxDocsPerFp: Long = 50L): DataFrame = {
    val freq = fps.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val kept = fps
      .join(freq.filter(col("nd") <= maxDocsPerFp).select(col("fp")),
        Seq("fp"), "left_semi")
      .select(col("doc_id"), col("fp")).distinct()
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
  }

  /** ── Decontamination ───────────────────────────────────────────────
    * Flags training documents sharing any word n-gram with a held-out
    * (benchmark/eval) set. Returns one row per training doc:
    * (doc_id, n_matched, contaminated).
    *
    * Both sides hash grams to 8-byte xxhash64 keys so the join carries
    * longs, not strings; counts are unchanged vs joining the gram
    * strings themselves (injective at any realistic distinct-gram
    * cardinality — same argument as the n-gram Jaccard oracle), which
    * is what lets the DuckDB twin replay on raw strings.
    *
    * At 100 TB the held-out side is a benchmark suite (≤10⁶ grams):
    * `broadcast()` keeps the corpus side shuffle-free until the
    * per-doc count of MATCHED grams only.
    */
  def decontaminate(train: DataFrame, holdout: DataFrame, n: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val heldGrams = holdout
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .select(xxhash64(col("gram")).as("gh")).distinct()
    val trainGrams = train
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gh"))
    val hits = trainGrams
      .join(broadcast(heldGrams), Seq("gh"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_matched"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)) > 0).cast("int").as("contaminated"))
  }

  /** ── Repeated-span detection (ExactSubstr self-dedup signal) ──────
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language
    * Models Better") strip substrings that occur VERBATIM more than
    * once across the corpus — memorization fuel document-level
    * near-dup passes structurally miss (a boilerplate license block
    * inside otherwise-distinct files, a quoted paragraph). Their
    * suffix array is replaced by the distributed-friendly equivalent:
    * every n-token window at stride `stride` is hashed, and a window
    * is a repeated span iff its hash occurs > 1 time corpus-wide
    * (same doc or another — ExactSubstr semantics). Returns one row
    * per doc: (doc_id, n_windows, n_repeated, repeated_frac) — the
    * filter/trim decision stays with the caller.
    *
    * Scale shape: window generation is a stateless per-doc map (the
    * token-scale explode IS the honest cost — a suffix array is
    * token-scale too; `stride` > 1 trades span-boundary resolution
    * for a 1/stride row cut). Hashes are 8-byte longs end-to-end;
    * the duplicate-hash table comes from ONE map-side-combinable
    * count, and the per-doc rollup is one hash-keyed left join +
    * one doc-grain agg. The window frame is scanned twice (once for
    * the global count, once for the rollup) — both stateless maps
    * over the doc scan, no materialization.
    */
  def repeatedSpans(docs: DataFrame, n: Int = 8, stride: Int = 1,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"window must be >= 1 token, got $n")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val tk = TextOps.tokens(col(textCol))
    val wins = docs.select(col(idCol),
        when(size(tk) >= n,
          transform(sequence(lit(0),
              ((size(tk) - n) / stride).cast("int")),
            j => concat_ws(" ", slice(tk, j * stride + 1, lit(n)))))
          .otherwise(array().cast("array<string>")).as("w"))
      .select(col(idCol), explode(col("w")).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gh"))
    val rep = wins.groupBy(col("gh")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select(col("gh"), lit(1).as("r"))
    val perDoc = wins
      .join(rep.hint("shuffle_hash"), Seq("gh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("r"), lit(0))).cast("long").as("n_repeated"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"))
      .withColumn("repeated_frac",
        when(col("n_windows") === 0, lit(0.0))
          .otherwise(col("n_repeated").cast("double") / col("n_windows")))
  }

  /** ── Temperature-scaled mixture weights (α = 1/2) ─────────────────
    * The classic multilingual/domain smoothing (mBERT/XLM-R sampling;
    * the fixed-α end of DoReMi-style reweighting): resample stratum d
    * from its natural share p_d toward q_d ∝ p_d^α, boosting tails
    * without flattening heads. α is PINNED at 1/2 so every transform
    * is a cross-engine-exact IEEE op (√ is correctly rounded; pow is
    * not) — the same discipline that keeps ln out of the PMI oracle.
    *
    * Returns stratum-grain rows; `weight` = q_d/p_d is exactly the
    * per-stratum multiplier [[resampleMixture]] consumes, so
    * `resampleMixture(docs, weights)` with these values retargets the
    * corpus to the smoothed mix at (in expectation) unchanged size.
    * One stratum-grain count + two one-row aggregates; the Σ√p sum
    * spans |strata| terms, far under any fp-order concern at 6dp.
    */
  def temperatureWeights(docs: DataFrame,
                         stratumCol: String = "lang"): DataFrame = {
    val cnt = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
    val tot = cnt.agg(sum(col("n")).as("ntot"))
    val wp = cnt.crossJoin(broadcast(tot))
      .withColumn("p", col("n") / col("ntot"))
      .withColumn("s", sqrt(col("p")))
    val z = wp.agg(sum(col("s")).as("Z"))
    wp.crossJoin(broadcast(z))
      .select(col(stratumCol), col("n"), col("p"),
        (col("s") / col("Z")).as("q"))
      .withColumn("weight", col("q") / col("p"))
  }

  /** ── Sequence packing ─────────────────────────────────────────────
    * Assigns each document (in doc_id order) a pack id so concatenated
    * packs hold ~`budget` tokens: pack_id = ⌊prefix_tokens / budget⌋
    * where prefix_tokens is the token count of all PRIOR docs — the
    * "concat the stream, cut every `budget` tokens" discipline (a doc
    * may straddle a boundary; it belongs to the pack where it begins,
    * at offset pack_offset).
    *
    * The prefix sum is distributed: cumsum inside doc_id/bucketSize
    * buckets (windows over ≤bucketSize rows), then a per-bucket offset
    * computed from the tiny bucket-totals table. Choose
    * bucketSize ≈ √n so both window widths stay bounded; no global
    * single-partition sort anywhere.
    */
  def packSequences(docs: DataFrame, budget: Int = 256, bucketSize: Long = 512,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      TextOps.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      (col(idCol).cast("long") / bucketSize).cast("long").as("bkt"))
    val inBkt = toks.withColumn("cum_in_bkt",
      sum(col("n_tokens")).over(
        Window.partitionBy("bkt").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bktOffsets = toks.groupBy("bkt").agg(sum("n_tokens").as("bkt_total"))
      .withColumn("bkt_offset",
        coalesce(sum(col("bkt_total")).over(
          Window.orderBy("bkt")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "bkt_offset")
    inBkt.join(broadcast(bktOffsets), Seq("bkt"))
      .withColumn("prefix", col("bkt_offset") + col("cum_in_bkt") - col("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        (col("prefix") / budget).cast("long").as("pack_id"),
        pmod(col("prefix"), lit(budget.toLong)).as("pack_offset"))
  }

  /** Half range of the multiplicative hash: 2³¹ keeps the product
    * (doc_id mod 2³¹) · 2654435761 under 2⁶³ for any doc_id — exact in
    * both engines' 64-bit integer arithmetic (2³² would overflow).
    */
  val SampleHashMod = 2147483648L
  private val Knuth = 2654435761L

  /** ── Deterministic stratified sampling ────────────────────────────
    * Keeps a row iff knuthHash(id + salt) < rate(stratum) · 2³¹ — pure
    * per-row arithmetic (Knuth's multiplicative hash), so the sample is
    * reproducible across runs, engines and cluster sizes, with zero
    * shuffle and no RNG state. Strata without a configured rate fall
    * back to `defaultRate`.
    */
  def knuthHash(id: Column, salt: Long): Column =
    pmod(pmod(id.cast("long") + salt, lit(SampleHashMod)) * Knuth, lit(SampleHashMod))

  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "lang", defaultRate: Double = 0.0,
                       salt: Long = 0L, idCol: String = "doc_id"): DataFrame = {
    val rate = coalesce(
      element_at(typedLit(rates), col(strataCol)), lit(defaultRate))
    docs.filter(
      knuthHash(col(idCol), salt) < (rate * SampleHashMod).cast("long"))
  }

  /** ── Mixture resampling (domain up/down-weighting) ────────────────
    * Repeats each row ⌊w⌋ or ⌈w⌉ times for its stratum's mixture
    * weight w, choosing the ceiling deterministically for a
    * hash-selected `frac(w)` share of ids — so the expected multiplier
    * is exactly w, reproducibly, with no RNG state. Emits
    * (…row…, copy_idx); w < 1 downsamples (some rows get 0 copies).
    * One scan + one explode of bounded fan-out — shuffle-free.
    */
  def resampleMixture(docs: DataFrame, weights: Map[String, Double],
                      strataCol: String = "lang", defaultWeight: Double = 1.0,
                      salt: Long = 0L, idCol: String = "doc_id"): DataFrame = {
    val w = coalesce(
      element_at(typedLit(weights), col(strataCol)), lit(defaultWeight))
    val base = floor(w) // BIGINT
    val frac = w - base.cast("double")
    val extra = (knuthHash(col(idCol), salt) <
      (frac * SampleHashMod).cast("long")).cast("long")
    docs.withColumn("n_copies", base + extra)
      .filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over
  * `documents(doc_id, text, …)`.
  *
  * Scale notes (100 TB discipline):
  *  - exact dedup is one hash-shuffle on a 32-byte key;
  *  - MinHash/SimHash avoid the O(n²) candidate explosion by banding /
  *    segment blocking, so the only shuffles are groupBys on short
  *    bucket keys and the verify joins touch candidate pairs only;
  *  - all signatures are computed with codegen'd higher-order functions
  *    (transform/aggregate/filter) over token arrays — no UDFs.
  */
object Dedup {

  import graft.text.TextOps.tokens
  import graft.functions.{minhash_sig, simhash64}

  private val P = 2147483647L // Mersenne prime 2^31-1 for affine hashes

  /** k-char shingle hashes via substr over a position sequence. */
  def shingleHashes(text: Column, k: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(k)))))

  /** ── Exact dedup ───────────────────────────────────────────────────
    * sha256 over normalized text; keeps the min doc_id per group.
    * Returns (doc_id, groupSize, keeper).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val key = sha2(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 256)
    docs.withColumn("dupKey", key)
      .groupBy("dupKey")
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("group_size"))
  }

  def exactDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val key = sha2(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), 256)
    val keepers = docs.withColumn("dupKey", key)
      .groupBy("dupKey").agg(min(col("doc_id")).as("doc_id"))
    docs.join(keepers, Seq("doc_id"), "left_semi")
  }

  /** ── MinHash + LSH ─────────────────────────────────────────────────
    * numPerms affine min-hashes over k-char shingles, banded into
    * `bands` groups of rows; docs sharing any band bucket become
    * candidates; candidates verified by true shingle-Jaccard ≥ threshold.
    * Returns verified near-dup pairs (a, b, jaccard), a < b.
    */
  def minHashSignature(text: Column, numPerms: Int = 32, k: Int = 5): Column =
    minhash_sig(text, numPerms, k) // single-pass native expression

  def minHashCandidates(docs: DataFrame, numPerms: Int = 32, bands: Int = 8,
                        k: Int = 5, textCol: String = "text"): DataFrame = {
    val rowsPerBand = numPerms / bands
    val sig = docs.select(col("doc_id"),
      minHashSignature(col(textCol), numPerms, k).as("sig"))
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "bucket")))
    banded.as("l").join(banded.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.band") === col("r.band") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  def minHashNearDups(docs: DataFrame, threshold: Double = 0.7,
                      numPerms: Int = 32, bands: Int = 8, k: Int = 5,
                      textCol: String = "text"): DataFrame = {
    val cands = minHashCandidates(docs, numPerms, bands, k, textCol)
    val sh = docs.select(col("doc_id"), shingleHashes(col(textCol), k).as("sh"))
    cands
      .join(sh.select(col("doc_id").as("a"), col("sh").as("shA")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("sh").as("shB")), Seq("b"))
      .withColumn("jaccard",
        size(array_intersect(col("shA"), col("shB"))).cast("double") /
          size(array_union(col("shA"), col("shB"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** ── SimHash ───────────────────────────────────────────────────────
    * 64-bit token-hash bit votes; near-dups = pairs at Hamming distance
    * ≤ maxDist, blocked on 4 16-bit segments (a pair within distance 3
    * must agree on ≥1 segment).
    */
  def simHash(text: Column): Column = simhash64(text) // single-pass native

  def simHashNearDups(docs: DataFrame, maxDist: Int = 3,
                      textCol: String = "text"): DataFrame = {
    val sigs = docs.select(col("doc_id"), simHash(col(textCol)).as("sig"))
    val seg = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(s =>
        shiftrightunsigned(col("sig"), s * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("segIdx", "segVal")))
    val hamming = (0 until 64)
      .map(b => shiftrightunsigned(col("sigA").bitwiseXOR(col("sigB")), b)
        .bitwiseAND(1L))
      .reduce(_ + _)
    seg.as("l").join(seg.as("r"),
        col("l.segIdx") === col("r.segIdx") && col("l.segVal") === col("r.segVal") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        col("l.sig").as("sigA"), col("r.sig").as("sigB"))
      .distinct()
      .select(col("a"), col("b"), hamming.as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** ── n-gram Jaccard ────────────────────────────────────────────────
    * Exact token-n-gram Jaccard for given candidate pairs (a, b).
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, n: Int = 3,
                   textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    val grams = docs.select(col("doc_id"),
      array_distinct(transform(
        sequence(lit(1), greatest(size(tk) - (n - 1), lit(1))),
        i => xxhash64(concat_ws(" ", slice(tk, i, lit(n)))))).as("g"))
    pairs
      .join(grams.select(col("doc_id").as("a"), col("g").as("gA")), Seq("a"))
      .join(grams.select(col("doc_id").as("b"), col("g").as("gB")), Seq("b"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("gA"), col("gB"))).cast("double") /
          size(array_union(col("gA"), col("gB"))).cast("double"), 6).as("jaccard"))
  }
}

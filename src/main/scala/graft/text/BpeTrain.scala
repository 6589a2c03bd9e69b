package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule induction (Sennrich et al. 2016,
  * arXiv:1508.07909) over a document corpus — the tokenizer-training
  * operator a 100 TB training-data pipeline runs before anything else.
  *
  * Scale shape (the whole point of doing this on Spark):
  *  - the CORPUS is touched exactly once, by the word-frequency
  *    aggregation (one map-side-combinable shuffle on the word key);
  *  - every merge round thereafter runs over the DISTINCT-WORD table,
  *    which Heaps' law keeps orders of magnitude smaller than the
  *    corpus (~10⁶–10⁷ rows at 100 TB vs ~10¹¹ documents);
  *  - a merge round is one adjacent-pair explode + one
  *    map-side-combinable pair count + a 1-row TakeOrdered argmax +
  *    one map-only array fold — no window, no join, no corpus rescan;
  *  - the argmax collect is the algorithm's inherent sequential
  *    dependency (merge k+1's counts depend on merge k), identical on
  *    a cluster: k tiny jobs over a vocab-scale table.
  *
  * Pair counting counts OVERLAPPING occurrences ("aaa" → (a,a) twice)
  * and the merge applies LEFT-TO-RIGHT NON-OVERLAPPING ("aaa" with
  * merge (a,a) → [aa, a]) — both per the reference BPE semantics.
  * Ties in pair frequency break by (left asc, right asc), making the
  * whole merge sequence deterministic and engine-independent.
  */
object BpeTrain {

  /** One learned merge rule, in application order. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  final case class Result(merges: Seq[Merge], vocab: DataFrame)

  private val EOW = "</w>"

  /** Word-frequency table — the ONE corpus-scale pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** A word as its initial symbol sequence: one symbol per character
    * plus a terminal end-of-word marker (the Sennrich convention that
    * lets merges distinguish suffixes from infixes).
    */
  def initialSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EOW)))

  /** Frequency-weighted adjacent-pair counts over a (syms, freq)
    * table. Overlapping occurrences all count, matching the reference
    * counting (zip(word, word[1:])). Map-side combinable: the explode
    * emits one skinny (left, right, freq) row per adjacent position of
    * the DISTINCT-word table, and partial sums collapse them before
    * the exchange.
    */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("l"),
                      element_at(col("syms"), i + 2).as("r")))).as("p"),
        col("freq"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum("freq").as("pair_count"))

  /** Left-to-right non-overlapping replacement of the adjacent pair
    * (l, r) by the fused symbol, as a single array fold (map-only; no
    * shuffle). The fold compares the accumulator's LAST element to
    * `l`: after a fusion the last element becomes l+r, which can never
    * re-fuse with a following r (l+r ≠ l for non-empty r) — exactly
    * the scan-and-skip semantics of the reference merge.
    */
  def applyMerge(syms: Column, l: String, r: String): Column = {
    val fused = l + r
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
             element_at(acc, size(acc)) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
          .otherwise(concat(acc, array(s))))
  }

  /** Learn up to `numMerges` merge rules from the corpus. Stops early
    * when the best remaining pair occurs fewer than `minPairCount`
    * times (weighted). `checkpointEvery` bounds the fold-chain plan
    * depth over the vocab-scale table.
    */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text",
            minPairCount: Long = 2L, checkpointEvery: Int = 8): Result = {
    val spark = docs.sparkSession
    var cur = wordCounts(docs, textCol)
      .select(initialSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint(true)
    var lastCp = cur

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(desc("pair_count"), asc("left_sym"), asc("right_sym"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, l, r, l + r, c)
        val next = cur.select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
        cur =
          if ((rank + 1) % checkpointEvery == 0) {
            val cp = next.localCheckpoint(true) // eager, then free the parent
            graft.algo.Superstep.freeCheckpoint(lastCp)
            lastCp = cp
            cp
          } else next
        rank += 1
      }
    }
    val vocab = cur
      .select(explode(col("syms")).as("symbol"), col("freq"))
      .groupBy("symbol").agg(sum("freq").as("count"))
    Result(merges.result(), vocab)
  }

  /** Apply a learned merge sequence to a word column — the tokenize
    * pass. Map-only: k folds fused into one projection, no shuffle; at
    * 100 TB this is the single full-corpus tokenization scan, trivially
    * parallel. Returns the symbol array for each input word.
    */
  def segment(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(initialSymbols(word)) { (syms, m) =>
      applyMerge(syms, m.left, m.right)
    }

  /** Merge table as a DataFrame for persistence / inspection. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }
}

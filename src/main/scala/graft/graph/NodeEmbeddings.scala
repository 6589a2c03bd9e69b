package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic node embeddings by random indexing (Sahlgren 2005;
  * equivalently a count-sketch / hashing-trick projection of the
  * skip-gram co-occurrence matrix, Weinberger et al. 2009): each
  * context vertex owns a fixed ±1 signature vector drawn from a hash
  * of (context, dim), and a node's embedding is the count-weighted sum
  * of its contexts' signatures. emb(v)[d] = Σ_(v,c,cnt) cnt·sign(c,d).
  * This closes the DeepWalk pipeline ([[RandomWalks.run]] →
  * [[RandomWalks.skipGramPairs]] → here) with no trained parameters:
  * Johnson–Lindenstrauss gives ⟨emb(u), emb(v)⟩ ≈ the co-occurrence
  * dot product, which is what downstream cosine top-k / clustering
  * actually consume.
  *
  * The sign hash is the same exact-BIGINT double-quadratic scramble
  * as `Mis.key` (every operand < 2⁶², replayable in any 64-bit
  * engine), so the embeddings are bit-identical cross-engine — unlike
  * xxhash64, which only Spark has.
  *
  * Scale shape: the dims-fold explode happens BEFORE the partial
  * aggregate, so it multiplies map-side CPU but not exchange volume —
  * the one shuffle carries ≤ (distinct centers per partition)·dims
  * partially-summed rows, and the result is |V|·dims skinny longs.
  * No joins, no windows, no signature table (signatures are computed
  * arithmetically from the context id, never materialized or
  * broadcast).
  */
object NodeEmbeddings {

  private val P = 2147483647L // 2^31 - 1

  /** ±1 signature: double quadratic scramble of (context·2048 + dim)
    * mod P, parity-mapped. `dim` must stay < 2048 so distinct (context,
    * dim) seeds stay distinct mod the fold.
    */
  def sign(context: Column, dim: Column): Column = {
    val s0 = pmod(pmod(context, lit(P)) * lit(2048L) + dim, lit(P))
    val q1 = pmod(s0 * (s0 + lit(3L)), lit(P))
    val q2 = pmod(q1 * (q1 + lit(7L)), lit(P))
    when(pmod(q2, lit(2L)) === 0, lit(1L)).otherwise(lit(-1L))
  }

  /** @param pairs (center, context, cnt) rows from
    *              [[RandomWalks.skipGramPairs]] (or any co-occurrence
    *              table of the same shape)
    * @param dims  embedding width, ≤ 2048
    * @return (id, dim, value) exact-integer rows, dims per center
    */
  def randomIndexing(pairs: DataFrame, dims: Int = 16): DataFrame = {
    require(dims > 0 && dims <= 2048, s"dims must be in [1, 2048], got $dims")
    pairs
      .select(col("center").as("id"), col("context"), col("cnt"),
        explode(sequence(lit(0L), lit(dims - 1L))).as("dim"))
      .groupBy(col("id"), col("dim"))
      .agg(sum(col("cnt") * sign(col("context"), col("dim"))).as("value"))
  }

  /** Pivot (id, dim, value) rows into (id, vector array<float>) for the
    * ANN / cosine operators ([[graft.sim.Similarity]]). One exchange
    * (the groupBy), vectors ordered by dim.
    */
  def vectors(embeddings: DataFrame): DataFrame =
    embeddings
      .groupBy(col("id"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("value")))),
        x => x.getField("value").cast("float")).as("vector"))

  /** Pointwise mutual information over a co-occurrence count table —
    * the association score SGNS embeddings implicitly factorize (Levy
    * & Goldberg 2014: SGNS ≈ PMI − log k), and the classic "related
    * entities" ranking on the walk corpus.
    *
    * Emits BOTH forms per (center, context) pair:
    *  - `pmi_ratio` = cnt·N / (c_center·c_context): one division of
    *    two EXACT integer products (every operand < 2⁶³; doubles are
    *    exact below 2⁵³) — bit-reproducible in any IEEE engine, which
    *    is why the driver oracle compares this column;
    *  - `pmi` = ln(pmi_ratio): the standard log form. Kept out of the
    *    cross-engine oracle because libm `ln` is not guaranteed
    *    identical to the last ulp across engines; the spec pins
    *    pmi = ln(pmi_ratio) instead.
    *
    * Scale shape: two map-side-combinable marginal aggregations
    * (vertex-sized), two vertex-keyed joins of the pair table, one
    * driver scalar for N. No windows; the pair table is the only
    * edge-scale frame and it crosses the wire once per join key.
    */
  def pmiScores(pairs: DataFrame): DataFrame = {
    val n = pairs.agg(sum(col("cnt"))).head().getLong(0)
    val ca = pairs.groupBy(col("center")).agg(sum(col("cnt")).as("c_center"))
    val cb = pairs.groupBy(col("context")).agg(sum(col("cnt")).as("c_context"))
    pairs
      .join(ca.hint("shuffle_hash"), Seq("center"))
      .join(cb.hint("shuffle_hash"), Seq("context"))
      .withColumn("pmi_ratio",
        (col("cnt") * lit(n)).cast("double") /
          (col("c_center") * col("c_context")).cast("double"))
      .select(col("center"), col("context"), col("cnt"),
        col("pmi_ratio"), log(col("pmi_ratio")).as("pmi"))
  }
}

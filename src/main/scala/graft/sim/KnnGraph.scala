package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate k-NN graph construction by NN-Descent (Dong, Charikar,
  * Li, "Efficient k-nearest neighbor graph construction for generic
  * similarity measures", WWW 2011) — the batch answer to the
  * reference's HNSW vector index (`graph/constraints.py:289-364`).
  * HNSW is a sequential pointer-chasing insert loop; NN-Descent
  * reaches the same "a neighbor of a neighbor is likely a neighbor"
  * fixed point with nothing but joins and bounded per-key top-k
  * aggregations, which is the form that distributes. The k-NN graph
  * is also a first-class curation artifact itself (semantic-dup
  * clustering, diversity sampling, label propagation over items).
  *
  * Metric (ADVICE r4): this builder is squared-L2 only, while the
  * reference's `create_vector_index` defaults to cosine. The two
  * orderings coincide exactly when vectors are unit-normalized
  * (‖a−b‖² = 2 − 2·cos on the unit sphere) — normalize embeddings
  * before integerizing (`Coreset.intVec`) when cosine semantics are
  * required, as embedding pipelines conventionally do anyway. For
  * unnormalized vectors use [[Similarity]]'s CosineSim-based top-k;
  * an exact-integer cosine ORDERING inside NN-Descent would need
  * cross-multiplied norm comparisons per pair (rational arithmetic),
  * which costs more than normalizing once up front.
  *
  * Scale shape, per round:
  *   - reverse lists capped at `revCap` by a (d, id)-lexicographic
  *     bounded selection, so a hub that half the corpus points at
  *     contributes `revCap` candidates, not its full fan-in;
  *   - candidate pairs come from ONE vertex-keyed self-join of the
  *     ≤ (k + revCap)-row adjacency — Σ_v C(k+revCap, 2) pairs total,
  *     never all-pairs;
  *   - each new pair costs ONE exact-BIGINT squared-L2 evaluation
  *     (components integerized once at the 1e-5 grain, the
  *     Kmeans/Coreset parity discipline), so ordering is
  *     bit-deterministic — no fp comparison anywhere;
  *   - the merge is a per-key top-k over ≤ k + C(k+revCap, 2) rows
  *     (array_sort + slice inside one aggregate — no window, no
  *     global sort), ties broken by neighbor id.
  *
  * Determinism: the init lists come from the same double-quadratic
  * scramble the samplers use ([[graft.graph.GraphOps.sampleKeep]]),
  * so the whole run — init, candidate generation, selection — is a
  * pure function of (ids, vectors, k, rounds, revCap) at any
  * parallelism, and the DuckDB twin replays it exactly.
  *
  * Contract: ids must be 0..n−1 (the synthetic `vec_id` already is;
  * rank once if yours are not). Convergence: the paper measures
  * ≳90 % recall within 4-6 rounds on real embeddings; rounds is a
  * fixed budget here, engine-replayable.
  */
object KnnGraph {

  /** @param neighbors (src, dst, d) — k rows per src, d = exact
    *   integerized squared L2 distance, ascending (d, dst) per src.
    */
  final case class Result(neighbors: DataFrame, rounds: Int)

  private val P = 2147483647L // 2^31 − 1, the sampler prime

  private def scramble(key: Column): Column = {
    val vp = pmod(key, lit(P))
    val q1 = pmod(vp * (vp + lit(3L)), lit(P))
    pmod(q1 * (q1 + lit(7L)), lit(P))
  }

  /** Bounded per-src top-k by (d, dst) through the native
    * [[graft.functions.BoundedTopK]] aggregate with score = −d:
    * (−d desc, id asc) ≡ (d asc, id asc), partial aggregation bounds
    * every map-side output to k pairs per group, and the buffer is
    * idempotent on exact duplicates (≡ the twin's DISTINCT). Exact
    * because d < 2⁵³ (guarded in [[run]]) is represented losslessly
    * in the double score.
    */
  private def topPerSrc(cand: DataFrame, k: Int): DataFrame =
    cand.groupBy(col("src"))
      .agg(graft.functions.bounded_topk(
        (-col("d")).cast("double"), col("dst"), k).as("nn"))
      .select(col("src"), explode(col("nn")).as("e"))
      .select(col("src"), col("e.id").as("dst"),
        (-col("e.score")).cast("long").as("d"))

  private def withDist(pairs: DataFrame, pts: DataFrame): DataFrame =
    pairs
      .join(pts.select(col("id").as("a"), col("iv").as("iva")), Seq("a"))
      .join(pts.select(col("id").as("b"), col("iv").as("ivb")), Seq("b"))
      .select(col("a"), col("b"), Coreset.sqDist(col("iva"), col("ivb")).as("d"))

  def run(spark: SparkSession, corpus: DataFrame, k: Int, rounds: Int,
          idCol: String = "vec_id", vecCol: String = "embedding",
          scale: Long = 100000L, revCapOpt: Option[Int] = None): Result = {
    require(k >= 1 && rounds >= 0, s"bad k=$k / rounds=$rounds")
    val revCap = revCapOpt.getOrElse(k)
    require(revCap >= 1, s"bad revCap=$revCap")

    val pts = corpus
      .select(col(idCol).cast("long").as("id"),
        Coreset.intVec(col(vecCol), scale).as("iv"))
      .localCheckpoint(true)

    // one driver action: n for the init arithmetic + the same pack
    // overflow guard as Kmeans (sqDist must stay exact in a BIGINT)
    val Array(nRow) = pts.agg(
      count(lit(1)).as("n"), max(size(col("iv"))).as("dims"),
      max(aggregate(col("iv"), lit(0L),
        (acc, x) => greatest(acc, abs(x)))).as("maxAbs")).collect()
    val n = nRow.getLong(0)
    val dims = nRow.getInt(1)
    val maxAbs = nRow.getLong(2)
    require(n >= 2 && k < n, s"need 2 <= k+1 <= n, got k=$k n=$n")
    // 2^53, not 2^63: distances ride the bounded-top-k DOUBLE score
    // (exactly representable below 2^53); BigInt so the guard itself
    // cannot wrap before it checks
    require(BigInt(dims) * 4 * BigInt(maxAbs).pow(2) < BigInt(1L << 53),
      s"sqDist exceeds 2^53: dims=$dims max|iv|=$maxAbs at scale=$scale" +
        " — lower `scale` or reduce dimensionality")

    // init: k deterministic pseudo-random partners per vertex,
    // u = (v + 1 + scramble(v·1000003 + j) mod (n−1)) mod n  — never v
    val js = spark.range(k).select(col("id").as("j"))
    val init = pts.select(col("id"))
      .crossJoin(broadcast(js))
      .select(col("id").as("a"),
        pmod(col("id") + lit(1L) +
          pmod(scramble(col("id") * lit(1000003L) + col("j")), lit(n - 1)),
          lit(n)).as("b"))
      .distinct()
    var nb = topPerSrc(
      withDist(init, pts).select(col("a").as("src"), col("b").as("dst"), col("d")),
      k).localCheckpoint(false)

    for (_ <- 1 to rounds) {
      val (next, intermediates) = roundStage(nb, pts, k, revCap)
      // eager checkpoint so the round's shared intermediates (and the
      // previous neighbor table) can be freed deterministically right
      // here — rounds are few, so the extra job is noise against the
      // recompute it prevents
      val done = next.localCheckpoint(true)
      intermediates.foreach(graft.algo.Superstep.freeCheckpoint)
      graft.algo.Superstep.freeCheckpoint(nb)
      nb = done
    }
    Result(nb, rounds)
  }

  /** One NN-Descent round, returning (new neighbor lists, the round's
    * lazily-checkpointed shared intermediates for the caller to free
    * once the result is materialized).
    *
    * The checkpoints are load-bearing (r5): the adjacency+vectors
    * table feeds BOTH sides of the candidate self-join and the scored
    * pair table feeds BOTH directions of the candidate union, and
    * Spark does NOT reuse their exchanges (ReusedExchange=0 in the
    * materialized plan — the canonical subtrees differ by projection
    * aliases), so without the boundaries the entire candidate
    * generation ran twice per round.
    */
  private[graft] def roundStage(nb: DataFrame, pts: DataFrame,
                                k: Int, revCap: Int)
      : (DataFrame, Seq[DataFrame]) = {
    // reverse lists, capped to revCap by the same (d, id) order
    val revc = topPerSrc(
      nb.select(col("dst").as("src"), col("src").as("dst"), col("d")),
      revCap)
    val adj = nb.select(col("src").as("v"), col("dst").as("u"))
      .unionByName(revc.select(col("src").as("v"), col("dst").as("u")))
      .distinct()
    // attach vectors to the SKINNY adjacency once (≤ k+revCap rows
    // per vertex), then self-join on v and score inside the join
    // stage: the wide vector rows ride ONE exchange (reused for
    // both join sides) instead of shuffling through two per-pair
    // joins — at n·C(2k,2) pairs/round that is ~n·2k vector rows
    // on the wire instead of ~n·k²·2 (200k×64d probe: ~2 GB vs
    // ~20 GB/round). The local[32]/tmpfs A/B is steal-noise-bound
    // (157-242 s swings on identical code, BASELINE.md r4); the
    // byte arithmetic is the cluster-scale argument. A duplicated
    // pair (several common neighbors) costs a repeated O(dims)
    // kernel eval instead of a pre-join distinct; the (a, b, d)
    // distinct after scoring restores set semantics.
    val adjV = adj.join(pts.select(col("id").as("u"), col("iv")), Seq("u"))
      .localCheckpoint(false)
    val newEdges = adjV.as("x")
      .join(adjV.as("y"), col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .select(col("x.u").as("a"), col("y.u").as("b"),
        Coreset.sqDist(col("x.iv"), col("y.iv")).as("d"))
      .distinct()
      .localCheckpoint(false)
    val cand = nb.unionByName(
      newEdges.select(col("a").as("src"), col("b").as("dst"), col("d"))
        .unionByName(newEdges.select(col("b").as("src"), col("a").as("dst"),
          col("d"))))
    (topPerSrc(cand, k), Seq(adjV, newEdges))
  }

  /** Greedy beam search over a built k-NN graph — the query side of
    * the HNSW analogy (`db.index.vector.queryNodes`,
    * `graph/constraints.py:289-364`): from a fixed fan of entry
    * points, repeatedly expand the current beam's graph neighbors,
    * score them against the query (exact BIGINT, as in [[run]]), and
    * keep the best `beam` candidates; after `rounds` hops return each
    * query's top k. All queries walk in ONE dataflow — per round one
    * beam⨝graph join (≤ beam·k rows per query), one distance join,
    * one bounded per-query top-beam — so 10⁶ concurrent queries cost
    * a wider frame, not a longer pipeline. Entry points are the
    * deterministic lattice j·⌊n/beam⌋, so search is engine-replayable
    * end-to-end (no visited-set: re-reached vertices dedupe in the
    * top-beam, trading a little recompute for stateless rounds).
    */
  def search(corpus: DataFrame, graph: DataFrame, queries: DataFrame,
             k: Int, beam: Int, rounds: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "vec_id", scale: Long = 100000L): DataFrame = {
    require(k >= 1 && beam >= k && rounds >= 0,
      s"need 1 <= k <= beam, got k=$k beam=$beam rounds=$rounds")
    val spark = corpus.sparkSession
    val pts = corpus
      .select(col(idCol).cast("long").as("id"),
        Coreset.intVec(col(vecCol), scale).as("iv"))
      .localCheckpoint(true)
    val q = queries
      .select(col(queryIdCol).cast("long").as("qid"),
        Coreset.intVec(col(vecCol), scale).as("qiv"))
    val n = pts.count()
    require(beam <= n, s"beam=$beam exceeds corpus size $n")

    val step = n / beam
    val seeds = spark.range(beam)
      .select((col("id") * lit(step)).as("cand")).distinct()

    def score(frontier: DataFrame): DataFrame =
      frontier
        .join(pts.select(col("id").as("cand"), col("iv")), Seq("cand"))
        .join(q, Seq("qid"))
        .select(col("qid"), col("cand"),
          Coreset.sqDist(col("qiv"), col("iv")).as("d"))

    def topPerQuery(cand: DataFrame, cap: Int): DataFrame =
      cand.groupBy(col("qid"))
        .agg(graft.functions.bounded_topk(
          (-col("d")).cast("double"), col("cand"), cap).as("nn"))
        .select(col("qid"), explode(col("nn")).as("e"))
        .select(col("qid"), col("e.id").as("cand"),
          (-col("e.score")).cast("long").as("d"))

    var state = topPerQuery(
      score(q.select(col("qid")).crossJoin(broadcast(seeds))), beam)
      .localCheckpoint(false)
    val adj = graph.select(col("src").as("cand"), col("dst"))
    for (_ <- 1 to rounds) {
      val expand = state.join(adj, Seq("cand"))
        .select(col("qid"), col("dst").as("cand")).distinct()
      state = topPerQuery(state.unionByName(score(expand)), beam)
        .localCheckpoint(false)
    }
    topPerQuery(state, k)
      .select(col("qid").as("query_id"), col("cand").as("nn_id"),
        col("d").as("dist_sq"))
  }
}

package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.Superstep
import graft.functions.bounded_topk

/** GraphSAGE-style layered neighbor sampling (Hamilton et al. 2017
  * §3.1): from a seed set, draw a fixed fan-out of neighbors per
  * vertex per layer — the mini-batch subgraph extractor every
  * graph-ML training pipeline runs, and at link-graph scale the step
  * that turns "train on the 10^12-edge graph" into bounded per-batch
  * work.
  *
  * Sampling is DETERMINISTIC and engine-replayable: each candidate
  * edge gets the congruential rank
  *
  *   r = ((src mod M)·A + (dst mod M)·B + C_layer) mod M
  *
  * (A, B prime multipliers, M = 1e9+7; operands are mod-reduced
  * before every multiply so nothing overflows a 64-bit integer under
  * ANSI arithmetic — the same discipline as the matching edge key),
  * and a vertex keeps its `fanout` smallest (rank, dst) pairs. A
  * fresh per-layer salt C decorrelates layers. No RNG state, no
  * sampling seed to ship: the same (graph, seeds, fanouts) always
  * yields the same subgraph, so a DuckDB twin replays it row-for-row
  * (`neighbor_sample_sql_graph`).
  *
  * Scale shape per layer: ONE frontier⨝edges join (frontier-sized ×
  * mean degree) and ONE per-vertex [[bounded_topk]] aggregation whose
  * PARTIAL buffers bound every map-side output to ≤ fanout pairs per
  * (partition, vertex) — a 10⁸-degree hub ships O(parts·fanout)
  * rows, never its degree. The frontier for the next layer is the
  * distinct sampled-neighbor set (vertex-scale).
  */
object NeighborSampling {

  private val M = 1000000007L
  private val A = 1000003L
  private val B = 999979L

  /** The layer-salted congruential rank, exposed for the oracle twin. */
  private def rank(layer: Int) =
    pmod(pmod(col("src"), lit(M)) * lit(A)
      + pmod(col("dst"), lit(M)) * lit(B)
      + lit(12345L + 777L * layer), lit(M))

  /** @param symEdges symmetrized edges (both directions present)
    * @param seeds 1-column (id) frame of batch roots
    * @param fanouts neighbors to keep per vertex, one entry per layer
    * @return (layer, src, dst) sampled edges, layer starting at 1
    */
  def sample(spark: SparkSession,
             symEdges: DataFrame,
             seeds: DataFrame,
             fanouts: Seq[Int],
             numPartitions: Int = 32): DataFrame = {
    require(fanouts.nonEmpty && fanouts.forall(_ > 0),
      s"fanouts must be positive, got $fanouts")

    val edges = symEdges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    var frontier = seeds.select(col("id")).distinct()
    val layers = fanouts.zipWithIndex.map { case (f, i) =>
      val layer = i + 1
      val cand = edges
        .join(frontier.withColumnRenamed("id", "src").hint("shuffle_hash"),
          Seq("src"), "left_semi")
      val picked = cand
        .select(col("src"), col("dst"), rank(layer).as("r"))
        // top-k by score DESC ≡ smallest ranks via negation; rank
        // values < 2^30 are exact as doubles, ties broken by id asc
        .groupBy(col("src"))
        .agg(bounded_topk(-col("r").cast("double"), col("dst"), f).as("top"))
        .select(col("src"), explode(col("top.id")).as("dst"))
      val out = Superstep.freshCheckpoint(
        picked.select(lit(layer).as("layer"), col("src"), col("dst")),
        eager = true)
      frontier = out.select(col("dst").as("id")).distinct()
      out
    }
    layers.reduce(_ unionAll _)
  }

  /** Deterministic negative-edge sampling for link-prediction
    * training: per seed vertex, up to `k` verified NON-neighbors. Each
    * seed probes `k + pad` congruential candidates over the id domain
    * [0, max_id]; probes that miss the vertex set, hit the seed
    * itself, or collide with a real edge are discarded and the k
    * lowest-probe-index survivors are kept — so the yield per seed is
    * ≤ k and can fall short for near-complete vertices or tiny id
    * domains (raise `pad` there). Dense ids (the normalizer's output
    * convention) keep the miss rate near zero.
    *
    * Scale shape: one explode to (k+pad) rows per seed, one semi-join
    * against the vertex set, one edge-keyed anti-join against the
    * (symmetric) edge table, one [[bounded_topk]] — no global sort,
    * no per-vertex arrays, all exchanges keyed on vertex/edge ids.
    * Deterministic and engine-replayable (`negative_sample_sql_graph`).
    */
  def negativeSample(spark: SparkSession,
                     symEdges: DataFrame,
                     seeds: DataFrame,
                     k: Int,
                     pad: Int = 8,
                     numPartitions: Int = 32): DataFrame = {
    require(k > 0 && pad >= 0, s"need k > 0, pad >= 0; got k=$k pad=$pad")
    val edges = symEdges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val verts = edges.select(col("src").as("id")).distinct()
    val maxId = verts.agg(max(col("id"))).collect()(0).getLong(0)
    val domain = maxId + 1L

    val cand = seeds.select(col("id").as("src")).distinct()
      .select(col("src"), explode(sequence(lit(1), lit(k + pad))).as("j"))
      .select(col("src"), col("j"),
        pmod(pmod(col("src"), lit(M)) * lit(A)
          + col("j") * lit(B) + lit(424243L), lit(domain)).as("dst"))
      .filter(col("src") =!= col("dst"))
    cand
      .join(verts.withColumnRenamed("id", "dst").hint("shuffle_hash"),
        Seq("dst"), "left_semi")
      .join(edges.hint("shuffle_hash"), Seq("src", "dst"), "left_anti")
      // distinct probe targets: two j's can alias to the same dst
      .groupBy(col("src"), col("dst")).agg(min(col("j")).as("j"))
      .groupBy(col("src"))
      .agg(bounded_topk(-col("j").cast("double"), col("dst"), k).as("top"))
      .select(col("src"), explode(col("top.id")).as("dst"))
  }
}

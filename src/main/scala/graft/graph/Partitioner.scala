package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.{Matching, Superstep}

/** Multilevel balanced graph bisection (Hendrickson–Leland 1995 /
  * Karypis–Kumar METIS shape) — partitioning IS the 100 TB story: a
  * good edge-cut split of the entity graph is what makes every
  * downstream superstep's exchange local. Three phases:
  *
  *  1. COARSEN: `levels` rounds of [[Matching.coarsen]] — contract the
  *     locally-heaviest matching, each level fusing ≥ |M| vertices, so
  *     the graph shrinks geometrically while heavy edges leave the
  *     future cut first;
  *  2. SPLIT at the coarsest level by REGION GROWING (the Chaco/METIS
  *     graph-growing initial partition): BFS hop distances from the
  *     min-id coarse seed order the vertices (dist, mass DESC, id),
  *     and part 0 is the maximal prefix whose cumulative fine mass
  *     stays ≤ half — a connected-ish region, so coarse edges mostly
  *     fall inside a side instead of across; imbalance is bounded by
  *     the largest coarse vertex mass (unreached vertices order last
  *     and land in part 1);
  *  3. PROJECT the part labels back down through the composed
  *     mappings (no refinement pass here — [[edgeCut]] measures, and a
  *     boundary-refine can ride [[graft.algo.ModularityRefine]]'s
  *     schedule if needed).
  *
  * Everything is deterministic integer arithmetic over the same
  * matching rounds the oracle replays, so the full hierarchy is
  * cross-engine replayable; the split window runs over the COARSEST
  * frame only (≤ |V|·shrink^levels rows).
  *
  * @param weightedEdges canonical (src < dst) undirected weighted
  *                      edges, integer weights
  * @return (id, part) for every endpoint vertex, part ∈ {0, 1}
  */
object Partitioner {

  def bisect(spark: SparkSession,
             weightedEdges: DataFrame,
             levels: Int = 2,
             numPartitions: Int = 32): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    var edges = weightedEdges
    // mass(id) = number of FINE vertices fused into the coarse vertex
    var mass = weightedEdges.select(col("src").as("id"))
      .unionAll(weightedEdges.select(col("dst").as("id")))
      .distinct().withColumn("mass", lit(1L))
    val mappings = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    for (_ <- 1 to levels) {
      val (mapping, coarse) = Matching.coarsen(spark, edges, numPartitions,
        strongOnly = true)
      mappings += mapping
      edges = Superstep.freshCheckpoint(coarse, eager = true)
      mass = Superstep.freshCheckpoint(
        mass.join(mapping.hint("shuffle_hash"), Seq("id"))
          .groupBy(col("coarse_id").as("id"))
          .agg(sum(col("mass")).as("mass")), eager = true)
    }

    // region-growing split over the coarsest frame (small by
    // construction — the only global-order window in the operator):
    // BFS hops from the min-id seed, prefix of cumulative mass ≤ half
    val seed = mass.agg(min(col("id"))).head().getLong(0)
    val total = mass.agg(sum(col("mass"))).head().getLong(0)
    val dist = graft.algo.ShortestPaths.run(spark,
        GraphOps.symmetrize(edges), Seq(seed), numPartitions)
      .select(col("id"), col("dist"))
    val far = 1000000000L // unreached coarse vertices order last
    val dealt = mass
      .join(dist.hint("shuffle_hash"), Seq("id"), "left")
      .withColumn("d", coalesce(col("dist"), lit(far)))
      .withColumn("cum", sum(col("mass")).over(
        Window.orderBy(col("d"), col("mass").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("part", when(col("cum") * 2 <= total, 0L).otherwise(1L))
      .select(col("id").as("coarse_id"), col("part"))

    // project back: compose the mappings fine→coarse, then join the deal
    val composed = mappings.reduceRight { (m, acc) =>
      m.select(col("id"), col("coarse_id").as("mid"))
        .join(acc.select(col("id").as("mid"), col("coarse_id")).hint("shuffle_hash"),
          Seq("mid"))
        .select(col("id"), col("coarse_id"))
    }
    composed
      .join(dealt.hint("shuffle_hash"), Seq("coarse_id"))
      .select(col("id"), col("part"))
  }

  /** Deterministic parallel FM-style refinement of a bisection: per
    * round, boundary vertices on the HEAVIER side (tie → part 1) with
    * positive gain (external minus internal incident weight) are
    * candidates; a candidate moves only when it beats every ADJACENT
    * candidate under (gain DESC, id ASC) — the [[graft.algo.Mis]]
    * local-best rule, so movers are an independent set. All movers go
    * the same direction, so each accepted move's gain is EXACT (its
    * neighborhood is static this round) and the cut strictly
    * decreases by the gain sum — rounds terminate because the cut is
    * a decreasing non-negative integer. Balance: heavy→light moves
    * shrink the imbalance until the moved mass overshoots it; the
    * overshoot is bounded by the last round's mover mass and the
    * direction flips with the sign, so the drift stays boundary-sized
    * (the spec pins it on the fixture).
    *
    * Scale shape, per round: one edges⨝parts join (edge-scale, the
    * boundary classifier), one per-vertex gain aggregation, one
    * candidate-restricted neighbor-best aggregation (struct min — the
    * Borůvka SortAggregate path), two skinny joins, no windows.
    *
    * @param parts0 (id, part) with part ∈ {0, 1}
    * @return (id, part) with edgeCut ≤ the input's, same id set
    */
  def refine(spark: SparkSession,
             weightedEdges: DataFrame,
             parts0: DataFrame,
             maxRounds: Int = 20,
             numPartitions: Int = 32): DataFrame = {
    val sym = weightedEdges
      .select(col("src"), col("dst"), col("weight").cast("long").as("w"))
      .unionAll(weightedEdges.select(col("dst").as("src"),
        col("src").as("dst"), col("weight").cast("long").as("w")))
    var parts = Superstep.freshCheckpoint(
      parts0.select(col("id"), col("part").cast("long").as("part"))
        .repartition(numPartitions, col("id")), eager = true)
    var round = 0
    var moved = 1L
    while (moved > 0 && round < maxRounds) {
      round += 1
      val lab = sym
        .join(parts.select(col("id").as("src"), col("part").as("pu"))
          .hint("shuffle_hash"), Seq("src"))
        .join(parts.select(col("id").as("dst"), col("part").as("pv"))
          .hint("shuffle_hash"), Seq("dst"))
      val gains = lab.groupBy(col("src").as("id"))
        .agg(sum(when(col("pu") =!= col("pv"), col("w"))
          .otherwise(-col("w"))).as("gain"))
      val counts = parts.groupBy(col("part")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = counts.values.sum
      val heavy = if (counts.getOrElse(1L, 0L) * 2 >= total) 1L else 0L
      val cand = Superstep.freshCheckpoint(
        gains.join(parts.hint("shuffle_hash"), Seq("id"))
          .filter(col("part") === heavy && col("gain") > 0)
          .select(col("id"), col("gain")), eager = true)
      // local-best among adjacent candidates: min (−gain, id) wins
      val nbrBest = sym
        .join(cand.select(col("id").as("src")).hint("shuffle_hash"), Seq("src"),
          "left_semi")
        .join(cand.select(col("id").as("dst"), col("gain").as("gd"))
          .hint("shuffle_hash"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(struct((-col("gd")).as("ng"), col("dst").as("nid"))).as("nb"))
      val winners = Superstep.freshCheckpoint(
        cand.join(nbrBest.hint("shuffle_hash"), Seq("id"), "left")
          .filter(col("nb").isNull ||
            struct((-col("gain")).as("ng"), col("id").as("nid")) < col("nb"))
          .select(col("id")), eager = true)
      moved = winners.count()
      if (moved > 0) {
        val next = Superstep.freshCheckpoint(
          parts.join(winners.withColumn("mv", lit(1L)).hint("shuffle_hash"),
              Seq("id"), "left")
            .select(col("id"),
              when(col("mv").isNotNull, lit(1L) - col("part"))
                .otherwise(col("part")).as("part")), eager = true)
        Superstep.freeCheckpoint(parts)
        parts = next
      }
      Superstep.freeCheckpoint(cand)
      Superstep.freeCheckpoint(winners)
    }
    parts
  }

  /** k-way partitioning by recursive bisection (the classic multilevel
    * k-way shape): bisect + refine, restrict each side to its internal
    * edges, recurse; side s at depth d owns the label range
    * [base, base + k/2^d). Vertices that lose every edge to the cut
    * (isolated within their side) keep the side's base label — they
    * are free movers with no cut contribution. k must be a power of
    * two. Work per depth ≈ one bisection of the (shrinking) side
    * subgraphs, all sides of a depth running over disjoint edge sets.
    */
  def partition(spark: SparkSession,
                weightedEdges: DataFrame,
                k: Int,
                levels: Int = 1,
                numPartitions: Int = 32): DataFrame = {
    require(k >= 2 && (k & (k - 1)) == 0, s"k must be a power of two, got $k")
    val endpoints = weightedEdges.select(col("src").as("id"))
      .unionAll(weightedEdges.select(col("dst").as("id"))).distinct()

    def go(edges: DataFrame, vertices: DataFrame, kk: Int,
           base: Long): DataFrame = {
      val half = refine(spark, edges,
        bisect(spark, edges, levels, numPartitions),
        numPartitions = numPartitions).localCheckpoint(false)
      // vertices isolated inside this side (every incident edge was
      // cut above) have no edge here: they keep the base label
      val missing = vertices.join(half.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(base).as("part"))
      val split =
        if (kk == 2) half.select(col("id"), (col("part") + base).as("part"))
        else {
          def internal(side: DataFrame) = edges
            .join(side.withColumnRenamed("id", "src").hint("shuffle_hash"),
              Seq("src"), "left_semi")
            .join(side.withColumnRenamed("id", "dst").hint("shuffle_hash"),
              Seq("dst"), "left_semi")
            .localCheckpoint(false)
          val side0 = half.filter(col("part") === 0).select(col("id"))
            .localCheckpoint(false)
          val side1 = half.filter(col("part") === 1).select(col("id"))
            .localCheckpoint(false)
          go(internal(side0), side0, kk / 2, base)
            .unionAll(go(internal(side1), side1, kk / 2, base + kk / 2))
        }
      split.unionAll(missing)
    }
    go(weightedEdges, endpoints, k, 0L)
  }

  /** Total weight of edges crossing the partition (the objective). */
  def edgeCut(weightedEdges: DataFrame, parts: DataFrame): Long = {
    val cut = weightedEdges
      .join(parts.select(col("id").as("src"), col("part").as("ps")), Seq("src"))
      .join(parts.select(col("id").as("dst"), col("part").as("pd")), Seq("dst"))
      .filter(col("ps") =!= col("pd"))
      .agg(coalesce(sum(col("weight")), lit(0L))).head().getLong(0)
    cut
  }
}

package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full multi-level Louvain: alternate [[ModularityRefine]] local-move
  * sweeps with community-graph coarsening, the two phases of the
  * classic Louvain method and the skeleton of the reference's Leiden
  * detection (community_detection.py:46-118 — leidenalg's
  * move/aggregate loop with the RBConfiguration objective at γ=1,
  * which at γ=1 is exactly Newman modularity). The north rule takes
  * LPA as the Leiden stand-in; this operator closes the remaining
  * structural gap — modularity ascent across aggregation levels — while
  * staying deterministic and integer-exact, so a DuckDB twin can
  * replay it bit-for-bit.
  *
  * Per level:
  *
  *   1. local move: `ModularityRefine.run` from the current partition
  *      (level 0 starts from singletons, the classic Louvain init)
  *      with a fixed, direction-gated round budget;
  *   2. coarsen: supernode = community; coarse edge weight =
  *      Σ fine weights over both directions, so an intra-community
  *      pair contributes its weight twice to the supernode's self-loop
  *      — precisely the Newman loop-counts-twice convention
  *      ModularityRefine's weighted mode expects (its Scaladoc);
  *   3. recurse on the weighted coarse graph; stop when a level stops
  *      shrinking the vertex count (no merge happened) or the level
  *      budget is spent.
  *
  * The fine→coarse mappings compose, so the result labels original
  * vertices; community ids canonicalize to the minimum member vertex
  * id, matching every other partition producer in `graft.algo`.
  *
  * Scale shape: each refine sweep is LPA-shaped (one edge⨝labels
  * shuffle + map-side-combinable aggs — see [[ModularityRefine]]);
  * coarsening is one groupBy over the edge table whose output shrinks
  * geometrically, so the whole multi-level pass costs a small constant
  * times one sweep over the original edges. Weights stay BIGINT at
  * every level (coarse weights are sums of fine counts), keeping the
  * argmax engine-reproducible with no float ties.
  */
object Louvain {

  /** @param cleanup frees the per-level checkpointed frames (edges,
    *   moved/refined labels, composed mappings) this run pinned in the
    *   block manager — without it a session looping over many graphs
    *   accumulates ~4 pinned frames per level per call. Invoke only
    *   AFTER materializing `labels` (they feed it).
    */
  final case class Result(labels: DataFrame, levels: Int,
                          cleanup: () => Unit = () => ())

  /** Split every community into its connected parts: connected
    * components of the same-community subgraph (self-loops dropped —
    * irrelevant to connectivity), each part's id = min member id,
    * matching [[ConnectedComponents]]' canonicalization. Vertices with
    * no same-community edge become singletons via the vertices param.
    */
  private[graft] def splitDisconnected(spark: SparkSession,
                                       symEdges: DataFrame,
                                       labels: DataFrame,
                                       numPartitions: Int): DataFrame = {
    val intra0 = symEdges.filter(col("src") =!= col("dst"))
      .join(labels.select(col("id").as("src"), col("community").as("cs"))
        .hint("shuffle_hash"), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("community").as("cd"))
        .hint("shuffle_hash"), Seq("dst"))
      .filter(col("cs") === col("cd"))
      .select(col("src"), col("dst"))
    // fresh eager checkpoint: CC's star rounds self-join their input,
    // and both an un-truncated join tree AND inherited checkpoint
    // stats (see Superstep.freshCheckpoint) blow planning up
    val intraCk = Superstep.freshCheckpoint(intra0, eager = true)
    ConnectedComponents.run(spark, intraCk, Some(labels.select(col("id"))),
        numPartitions)
      .select(col("id"), col("component").as("community"))
  }

  /** Coarsen a symmetrized weighted edge list by a partition.
    * Input rows both directions with weight `w`; output rows both
    * directions between supernodes, self-loops carrying 2× internal
    * weight (once per fine direction).
    */
  def coarsen(symEdges: DataFrame, labels: DataFrame): DataFrame = {
    val lsrc = labels.select(col("id").as("src"), col("community").as("cs"))
    val ldst = labels.select(col("id").as("dst"), col("community").as("cd"))
    symEdges
      .join(lsrc.hint("shuffle_hash"), Seq("src"))
      .join(ldst.hint("shuffle_hash"), Seq("dst"))
      .groupBy(col("cs").as("src"), col("cd").as("dst"))
      .agg(sum(col("w")).as("w"))
  }

  /** @param symEdges symmetrized undirected edges (both directions),
    *   optionally with a BIGINT `w` weight column (`weighted=true`)
    * @param roundsPerLevel fixed direction-gated local-move rounds per
    *   level (even, so both directions sweep; 2 pairs with the oracle)
    * @param vertices optional (id, …) vertex table: ids with no incident
    *   edge keep a self-community in the result (degree-0 vertices can
    *   never gain modularity by moving, so they are exact, not a
    *   convention) — same parity contract as LPA's / CC's param
    * @param connectSplit Leiden's refinement guarantee: after each
    *   level's local-move partition, split every community into its
    *   connected parts (connected components of the same-community
    *   subgraph, via the scale-safe [[ConnectedComponents]]) and
    *   coarsen on the SPLIT partition. Greedy local moves can strand a
    *   community in disconnected pieces (a vertex moves away and its
    *   old community falls apart behind it); plain Louvain freezes
    *   that mistake into the coarse graph forever, Leiden repairs it
    *   every level (Traag et al. 2019, the guarantee that
    *   distinguishes leidenalg — community_detection.py:46-118 — from
    *   Louvain). Use [[Leiden]] rather than passing this directly.
    */
  def run(spark: SparkSession,
          symEdges: DataFrame,
          numPartitions: Int = 32,
          maxLevels: Int = 4,
          roundsPerLevel: Int = 4,
          weighted: Boolean = false,
          vertices: Option[DataFrame] = None,
          connectSplit: Boolean = false,
          gammaNum: Long = 1L,
          gammaDen: Long = 1L): Result = {

    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    val wcol = if (weighted) col("w").cast("long") else lit(1L)
    var edges = Superstep.freshCheckpoint(
      symEdges.select(col("src"), col("dst"), wcol.as("w")), eager = true)
    var n = edges.select(col("src")).distinct().count()

    // composed mapping original id → current-level supernode id
    var mapping: DataFrame = null // null = identity (level 0)
    var level = 0
    var shrunk = true

    while (level < maxLevels && shrunk) {
      val singletons = edges.select(col("src").as("id")).distinct()
        .withColumn("community", col("id"))
      // one driver action per level: the refine chain is lazy
      // (earlyStop=false — the shrink gate below is the convergence
      // check) and this eager checkpoint materializes it
      val rr = ModularityRefine.run(spark, edges, singletons,
        numPartitions, maxRounds = roundsPerLevel, weighted = true,
        earlyStop = false, gammaNum = gammaNum, gammaDen = gammaDen)
      val moved = Superstep.freshCheckpoint(rr.labels, eager = true)
      rr.cleanup()
      val refined =
        if (connectSplit) Superstep.freshCheckpoint(
          splitDisconnected(spark, edges, moved, numPartitions), eager = true)
        else moved

      val nNext = refined.select(col("community")).distinct().count()
      shrunk = nNext < n
      if (shrunk) {
        mapping =
          if (mapping == null) refined
          else mapping.join(
            refined.select(col("id").as("community"),
              col("community").as("nc")).hint("shuffle_hash"),
            Seq("community"))
            .select(col("id"), col("nc").as("community"))
            .localCheckpoint(true)
        edges = Superstep.freshCheckpoint(coarsen(edges, refined), eager = true)
        n = nNext
        level += 1
      }
    }

    val connected =
      if (mapping == null)
        symEdges.select(col("src").as("id")).distinct()
          .withColumn("community", col("id"))
      else {
        // canonicalize supernode ids to min original member id
        val canon = mapping.groupBy(col("community").as("c"))
          .agg(min(col("id")).as("nc"))
        mapping.join(canon, mapping("community") === col("c"))
          .select(col("id"), col("nc").as("community"))
      }
    val labels = vertices match {
      case None => connected
      case Some(v) =>
        val isolated = v.select(col("id"))
          .join(connected.select(col("id")), Seq("id"), "left_anti")
          .withColumn("community", col("id"))
        connected.unionByName(isolated)
    }
    // same ownership contract as ModularityRefine.Result.cleanup: only
    // what THIS call registered; frames the caller creates later survive
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- preexisting
    Result(labels, level, () => Superstep.releaseIds(spark, mine.toSet))
  }
}

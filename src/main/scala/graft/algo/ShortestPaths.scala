package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-source BFS: hop distance from every vertex to each of a small
  * set of landmark vertices (the GraphX `ShortestPaths` shape; the
  * link-graph primitive behind "how far is this entity from the seed
  * set", landmark-based distance features, and diameter probes).
  *
  * Pregel frontier expansion: the state table holds every discovered
  * (id, landmark, dist) triple; each round the NEWLY discovered
  * frontier sends dist+1 to its neighbors, candidates are min-reduced
  * per (id, landmark), and already-settled pairs are anti-joined away.
  * BFS discovers each pair at its true minimum distance, so settled
  * rows never change — the state is append-only and the frontier (not
  * the full state) drives each round's join.
  *
  * Scale shape: per round the edge-sized work is ONE frontier⨝edges
  * join whose output is map-side min-combined before the (id,
  * landmark) exchange, plus a skinny anti-join against the state. The
  * frontier is the set of vertices at exactly distance t, so summed
  * over the whole run every (edge, landmark) pair crosses the wire
  * exactly once — total traffic |E|·|L|, same as |L| PageRank
  * iterations, regardless of diameter. Rounds = eccentricity of the
  * landmark set (small on web-ish graphs). State and frontier are
  * `freshCheckpoint`ed per round with [[Superstep.CheckpointGC]]
  * reclaiming superseded blocks, exactly as in
  * [[ConnectedComponents]]. Re-checkpointing the append-only state
  * each round costs one extra state-sized write per round (diameter×
  * amplification on the skinny 3-long rows) and buys a self-contained
  * GC-able result; at cluster scale route it through a [[Superstep]]
  * dir, where those writes are the durable resume points anyway.
  *
  * Unreachable (id, landmark) pairs are absent from the output (no
  * +inf sentinel), matching the SQL twin's semantics.
  */
object ShortestPaths {

  /** @param symEdges symmetrized edges (both directions present); pass
    *                 a directed edge table to get directed distances
    * @param landmarks small broadcast-sized set of source vertex ids
    * @return (id, landmark, dist) for every reachable pair, dist in
    *         hops, landmark rows themselves at dist 0
    */
  def run(spark: SparkSession,
          symEdges: DataFrame,
          landmarks: Seq[Long],
          numPartitions: Int = 32,
          maxIter: Int = 256): DataFrame = Superstep.withoutAQE(spark) {
    require(landmarks.nonEmpty, "ShortestPaths needs at least one landmark")
    import spark.implicits._

    val edges = Superstep.freshCheckpoint(
      symEdges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst"))
        .repartition(numPartitions, col("src")), eager = true)

    val init = landmarks.distinct.toDF("landmark")
      .select(col("landmark").as("id"), col("landmark"), lit(0L).as("dist"))
    var state = Superstep.freshCheckpoint(init, eager = true)
    var frontier = state
    var frontierSize = frontier.count()
    var iter = 0
    val gc = new Superstep.CheckpointGC(spark, keep = 4)

    while (frontierSize > 0 && iter < maxIter) {
      // dist+1 to every neighbor of the frontier; min-reduce is
      // map-side combinable so the exchange carries ≤ one row per
      // (vertex, landmark) even off high-degree frontiers
      val candidates = frontier
        .join(edges.hint("shuffle_hash"), frontier("id") === edges("src"))
        .select(edges("dst").as("id"), col("landmark"),
          (col("dist") + lit(1L)).as("dist"))
        .groupBy(col("id"), col("landmark"))
        .agg(min(col("dist")).as("dist"))
      val next = Superstep.freshCheckpoint(
        candidates.join(state.select(col("id"), col("landmark")),
          Seq("id", "landmark"), "left_anti"), eager = false)
      frontierSize = next.count() // materializes the lazy checkpoint
      if (frontierSize > 0) {
        state = Superstep.freshCheckpoint(state.unionByName(next), eager = true)
      }
      frontier = next
      gc.tick()
      iter += 1
    }
    require(frontierSize == 0,
      s"BFS frontier still live after $maxIter rounds — raise maxIter")
    // the newest loop-created checkpoint is the EMPTY final frontier,
    // created after the last state union — keep 2 so the returned
    // state survives the sweep
    gc.close(keepLatest = 2)
    Superstep.freeCheckpoint(edges)
    state
  }
}

package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Borůvka minimum spanning forest (Borůvka 1926; the parallel MST
  * algorithm — Kruskal/Prim are inherently sequential): each round
  * every component picks its minimum-weight outgoing edge under the
  * strict total order (weight, u, v), the picked edges join the
  * forest, and the components they connect merge. A strict total
  * order guarantees the picks are acyclic, so the result equals the
  * Kruskal MSF under the same order — unique even with tied weights.
  * Link-graph use: the forest is the lightest backbone connecting the
  * co-occurrence graph (cluster skeleton / hierarchy seed), and
  * round-resolution MSF is the standard single-linkage clustering
  * dendrogram builder.
  *
  * Scale shape, per round: ONE map-side-combinable min-aggregation
  * per component side (`min(struct(w, u, v, other))` — lexicographic
  * struct min, partial-aggregated before the exchange), then
  * component merging on the PICKED edges only — a graph with ≤ one
  * edge per live component, shrinking ≥2× per round — via the
  * O(log² n) [[ConnectedComponents]], then one relabel join of the
  * surviving cross edges against the comp-sized mapping. Intra-
  * component edges are dropped permanently as soon as their endpoints
  * merge, so the edge set shrinks monotonically. O(log n) rounds.
  *
  * Weights: any orderable numeric works, but cross-engine bit parity
  * is only guaranteed for integer weights (the DuckDB twin replays
  * the packed-BIGINT order; see `mstSqlOracle`).
  */
object Mst {

  /** @param weightedEdges (src, dst, weight) rows; direction and
    *                      duplicates are ignored (canonicalized to
    *                      distinct u<v pairs, min weight per pair)
    * @return the minimum spanning forest as (u, v, weight) rows,
    *         u < v; |V| − #components rows
    */
  def run(spark: SparkSession,
          weightedEdges: DataFrame,
          numPartitions: Int = 32,
          maxIter: Int = 64): DataFrame = Superstep.withoutAQE(spark) {
    val canon = weightedEdges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"),
        col("weight").as("w"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))

    // e carries the surviving CROSS edges with their component labels;
    // round 0 starts fully labeled by own id (every vertex its own comp)
    var e = Superstep.freshCheckpoint(
      canon.select(col("u"), col("v"), col("w"),
          col("u").as("cu"), col("v").as("cv"))
        .repartition(numPartitions, col("u")), eager = true)
    var eCount = e.count()
    var out: DataFrame = null
    val pinned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0

    while (eCount > 0 && round < maxIter) {
      round += 1
      // per-component argmin outgoing edge, both directions; the
      // struct min is lexicographic on (w, u, v, other) and (w, u, v)
      // is already unique per edge, so `other` never decides
      val bo = e.select(col("cu").as("comp"),
          struct(col("w"), col("u"), col("v"), col("cv").as("other")).as("s"))
        .unionAll(e.select(col("cv").as("comp"),
          struct(col("w"), col("u"), col("v"), col("cu").as("other")).as("s")))
      val picks = Superstep.freshCheckpoint(
        bo.groupBy(col("comp")).agg(min(col("s")).as("s"))
          .select(col("comp"), col("s.other").as("other"),
            col("s.w").as("w"), col("s.u").as("u"), col("s.v").as("v")),
        eager = true)
      pinned += picks

      val won = picks.select(col("u"), col("v"), col("w")).distinct()
      out = if (out == null) won else out.unionAll(won)

      // merge the picked component pairs: ≤1 edge per live component,
      // so this CC input shrinks geometrically round over round
      val cg = picks.select(col("comp").as("src"), col("other").as("dst"))
      val mapping = ConnectedComponents.run(spark, cg,
        numPartitions = numPartitions)
      val mu = mapping.select(col("id").as("cu"), col("component").as("ncu"))
      val mv = mapping.select(col("id").as("cv"), col("component").as("ncv"))
      val nextE = Superstep.freshCheckpoint(
        e.join(mu.hint("shuffle_hash"), Seq("cu"), "left")
          .join(mv.hint("shuffle_hash"), Seq("cv"), "left")
          .select(col("u"), col("v"), col("w"),
            coalesce(col("ncu"), col("cu")).as("cu"),
            coalesce(col("ncv"), col("cv")).as("cv"))
          .filter(col("cu") =!= col("cv")), eager = true)
      Superstep.freeCheckpoint(e)
      // the relabel is materialized, so the CC mapping can go now;
      // picks stay pinned (the forest union still references them)
      Superstep.freeCheckpoint(mapping)
      e = nextE
      val nextCount = e.count()
      require(nextCount < eCount,
        s"Borůvka round $round made no progress ($eCount cross edges)")
      eCount = nextCount
    }
    require(eCount == 0,
      s"Borůvka did not settle within $maxIter rounds — raise maxIter")
    val res = out
      .withColumnRenamed("w", "weight")
      .localCheckpoint(false)
    res.count()
    pinned.foreach(Superstep.freeCheckpoint)
    Superstep.freeCheckpoint(e)
    res
  }

  /** Single-linkage clustering at a distance threshold: cut the MSF
    * dendrogram at `threshold` — clusters are the connected components
    * of the forest edges with weight ≤ threshold, which equals the
    * components of the FULL graph restricted to weight ≤ threshold
    * (the defining property of the minimum spanning forest), computed
    * over |V|−c forest edges instead of |E|. Cluster label = min
    * member id; every input endpoint gets a label (singletons above
    * the cut keep their own id).
    */
  def singleLinkage(spark: SparkSession,
                    weightedEdges: DataFrame,
                    threshold: Long,
                    numPartitions: Int = 32): DataFrame = {
    val forest = run(spark, weightedEdges, numPartitions)
    val verts = weightedEdges.select(col("src").as("id"))
      .unionAll(weightedEdges.select(col("dst").as("id"))).distinct()
    val cut = forest.filter(col("weight") <= threshold)
      .select(col("u").as("src"), col("v").as("dst"))
    val labels = ConnectedComponents.run(spark, cut, Some(verts),
      numPartitions)
    Superstep.freeCheckpoint(forest)
    labels.select(col("id"), col("component").as("cluster"))
  }
}

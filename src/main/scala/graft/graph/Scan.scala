package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, Superstep, Triangles}

/** SCAN structural graph clustering (Xu et al., KDD 2007) — clusters,
  * hubs and outliers in one pass, the classic "communities plus the
  * vertices that bridge or dangle off them" decomposition a GraphRAG
  * entity graph wants before summarization: unlike LPA/Louvain every
  * vertex gets a ROLE, so bridging entities (hubs) are first-class
  * instead of being forced into an arbitrary side.
  *
  * Structural similarity over CLOSED neighborhoods Γ(v) = N(v) ∪ {v}:
  *
  *   σ(u,v) = |Γ(u) ∩ Γ(v)| / sqrt(|Γ(u)|·|Γ(v)|)
  *
  * For an EDGE (u,v): |Γ(u) ∩ Γ(v)| = common(u,v) + 2 (both endpoints
  * lie in both closed neighborhoods), so with ε = epsNum/epsDenom the
  * ε-similarity test is the exact BIGINT predicate
  *
  *   (common+2)² · epsDenom² ≥ epsNum² · (deg u + 1)(deg v + 1)
  *
  * — no square roots, no floats, replayable cross-engine. Cores have
  * ≥ mu ε-similar closed neighbors (self included, σ(v,v)=1). Clusters
  * are connected components of the core–core ε-edges (label = min
  * member id); non-core vertices ε-reachable from a core join the
  * smallest adjacent cluster as `border`. Remaining vertices are `hub`
  * if their plain neighborhood touches ≥ 2 distinct clusters, else
  * `outlier` (cluster = −1 for both).
  *
  * Scale shape: common counts ride the SAME degree-ordered triangle
  * enumeration as G-6/k-truss/link-scores ([[Triangles.enumerate]],
  * out-lists O(√m), total work O(m^{3/2})) — the one super-linear
  * surface, shared. Everything after is vertex-sized aggregations,
  * two skinny role joins, and a CC restricted to the (sparse) core
  * ε-subgraph on the O(log² n) small-star/large-star path. The
  * ε-edge frame is checkpointed once — it feeds the core count, the
  * cluster CC and the border join, and must not recompute the
  * enumeration three times.
  *
  * Reference anchor: community detection + per-entity community
  * assignment surface (reference `community_detection.py`), extended
  * with the SCAN role taxonomy.
  *
  * @param symEdges undirected edges, both directions or canonical —
  *   deduped internally to unique u<v pairs
  * @return (id, cluster, role) for every vertex; cluster = min member
  *   id for core/border rows, −1 for hub/outlier rows
  */
object Scan {

  def run(spark: SparkSession,
          symEdges: DataFrame,
          epsNum: Long = 2,
          epsDenom: Long = 5,
          mu: Long = 3,
          numPartitions: Int = 32): DataFrame = {
    require(epsNum > 0 && epsDenom > 0 && epsNum < epsDenom,
      s"eps must be a rational in (0,1), got $epsNum/$epsDenom")

    val pairs = symEdges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    val sym = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))

    // common neighbors per edge: each triangle {u,v,w} credits its
    // three edges once (the shared enumeration)
    val tri = Triangles.enumerate(pairs, numPartitions)
    val common = tri
      .select(explode(array(
        struct(least(col("u"), col("v")).as("a"),
          greatest(col("u"), col("v")).as("b")),
        struct(least(col("u"), col("w")).as("a"),
          greatest(col("u"), col("w")).as("b")),
        struct(least(col("v"), col("w")).as("a"),
          greatest(col("v"), col("w")).as("b")))).as("ed"))
      .groupBy(col("ed.a").as("src"), col("ed.b").as("dst"))
      .agg(count(lit(1)).as("common"))

    // ε-similarity as the exact integer predicate (no sqrt, no floats)
    val epsEdges = Superstep.freshCheckpoint(
      pairs
        .join(common, Seq("src", "dst"), "left")
        .join(deg.select(col("id").as("src"), col("deg").as("du")), Seq("src"))
        .join(deg.select(col("id").as("dst"), col("deg").as("dv")), Seq("dst"))
        .filter(
          (coalesce(col("common"), lit(0L)) + 2L)
            * (coalesce(col("common"), lit(0L)) + 2L)
            * lit(epsDenom * epsDenom)
            >= lit(epsNum * epsNum) * (col("du") + 1L) * (col("dv") + 1L))
        .select(col("src"), col("dst"))
        .repartition(numPartitions, col("src")),
      eager = true)

    val epsSym = epsEdges
      .union(epsEdges.select(col("dst").as("src"), col("src").as("dst")))
    // |N_ε(v)| includes v itself (σ(v,v) = 1 ≥ ε always)
    val epsCount = deg.join(
      epsSym.groupBy(col("src").as("id")).agg(count(lit(1)).as("ec")),
      Seq("id"), "left")
      .select(col("id"), (coalesce(col("ec"), lit(0L)) + 1L).as("ec"))
    val cores = Superstep.freshCheckpoint(
      epsCount.filter(col("ec") >= mu).select(col("id")), eager = true)

    // clusters: CC of the core-core ε-subgraph; vertices = cores so a
    // core with no core neighbor still forms its singleton cluster
    val coreEdges = epsEdges
      .join(cores.withColumnRenamed("id", "src").hint("shuffle_hash"),
        Seq("src"), "left_semi")
      .join(cores.withColumnRenamed("id", "dst").hint("shuffle_hash"),
        Seq("dst"), "left_semi")
    val clusters = Superstep.freshCheckpoint(
      ConnectedComponents.run(spark, coreEdges, vertices = Some(cores),
        numPartitions = numPartitions)
        .select(col("id"), col("component").as("cluster")),
      eager = true)

    // borders: non-core, ε-similar to ≥1 core; deterministic min pick
    val borders = epsSym
      .join(cores.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(clusters.select(col("id").as("dst"), col("cluster")), Seq("dst"))
      .groupBy(col("src").as("id"))
      .agg(min(col("cluster")).as("cluster"))

    val members = clusters.select(col("id"), col("cluster"), lit("core").as("role"))
      .unionAll(borders.select(col("id"), col("cluster"), lit("border").as("role")))

    // hubs vs outliers: plain-neighborhood view over member clusters
    val rest = deg.select(col("id"))
      .join(members.select(col("id")), Seq("id"), "left_anti")
    val restClusters = rest
      .join(sym.select(col("src").as("id"), col("dst")), Seq("id"))
      .join(members.select(col("id").as("dst"), col("cluster")), Seq("dst"))
      .groupBy(col("id"))
      .agg(countDistinct(col("cluster")).as("nc"))
    val nonMembers = rest
      .join(restClusters, Seq("id"), "left")
      .select(col("id"), lit(-1L).as("cluster"),
        when(coalesce(col("nc"), lit(0L)) >= 2, lit("hub"))
          .otherwise(lit("outlier")).as("role"))

    // materialize the result before releasing the frames it reads —
    // the lineage behind a freed localCheckpoint cannot recompute
    val out = members.unionAll(nonMembers).localCheckpoint(false)
    out.count()
    Superstep.freeCheckpoint(epsEdges)
    Superstep.freeCheckpoint(cores)
    Superstep.freeCheckpoint(clusters)
    out
  }
}

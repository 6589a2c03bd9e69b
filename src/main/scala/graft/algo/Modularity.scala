package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment over an undirected
  * graph, as one DataFrame aggregation — A-8. Matches leidenalg's
  * `partition.modularity` (community_detection.py:95-96) on loop-free
  * unweighted graphs:
  *
  *   Q = Σ_c [ m_c/m − (K_c/(2m))² ]
  *
  * with m = |undirected edges|, m_c = intra-community edges,
  * K_c = Σ degrees of community members.
  */
object Modularity {

  /** @param undirectedPairs one row per undirected edge (u < v)
    * @param communities (id, community) — community ids MUST follow
    *   this library's min-member canonicalization (every graft.algo
    *   producer does). Coverage may be partial: an endpoint missing
    *   from the table is treated as its own singleton community keyed
    *   by its vertex id, which is collision-free precisely BECAUSE a
    *   community id is the min id of its members and the missing
    *   vertex is not a member; so every edge still counts toward m
    *   (ADVICE r2 — an inner join silently dropped partially-covered
    *   edges). With foreign community ids (e.g. dense 0..k-1 cluster
    *   indices) a missing vertex whose id collides with a cluster
    *   index would silently merge into it — re-key such inputs to
    *   min-member ids first.
    */
  def modularity(undirectedPairs: DataFrame, communities: DataFrame): Double = {
    // ONE community join over the edge table; (m, intra) and the
    // per-community degree sums both come from the joined frame
    // (VERDICT r1: the previous form made three edge-table passes)
    val pairs = undirectedPairs.select(col("src"), col("dst"))
    val cSrc = communities.select(col("id").as("src"), col("community").as("cSrc"))
    val cDst = communities.select(col("id").as("dst"), col("community").as("cDst"))
    val joined = pairs.join(cSrc, Seq("src"), "left").join(cDst, Seq("dst"), "left")
      .select(coalesce(col("cSrc"), col("src")).as("cSrc"),
        coalesce(col("cDst"), col("dst")).as("cDst"))
      .localCheckpoint(false)

    val r = joined.agg(count(lit(1)).as("m"),
      sum(when(col("cSrc") === col("cDst"), 1L).otherwise(0L)).as("intra")).first()
    val m = r.getLong(0).toDouble
    if (m == 0) return 0.0
    val intra = r.getLong(1).toDouble

    // each undirected edge contributes degree 1 to both endpoints'
    // communities, so K_c = endpoint occurrences per community
    val sumSqRow = joined
      .select(explode(array(col("cSrc"), col("cDst"))).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("k"))
      .select(sum(col("k") * col("k")).as("s"))
      .first()
    val sumSq = if (sumSqRow.isNullAt(0)) 0.0 else sumSqRow.getLong(0).toDouble

    intra / m - sumSq / (4.0 * m * m)
  }
}

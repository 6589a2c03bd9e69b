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
    * @param communities (id, community)
    */
  def modularity(undirectedPairs: DataFrame, communities: DataFrame): Double = {
    val pairs = undirectedPairs.select(col("src"), col("dst"))
    val m = pairs.count().toDouble
    if (m == 0) return 0.0

    val cSrc = communities.select(col("id").as("src"), col("community").as("cSrc"))
    val cDst = communities.select(col("id").as("dst"), col("community").as("cDst"))
    val intra = pairs.join(cSrc, Seq("src")).join(cDst, Seq("dst"))
      .filter(col("cSrc") === col("cDst"))
      .count().toDouble

    val sym = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val sumSqRow = deg.join(communities, Seq("id"))
      .groupBy(col("community")).agg(sum(col("deg")).as("k"))
      .select(sum(col("k") * col("k")).as("s"))
      .first()
    val sumSq = if (sumSqRow.isNullAt(0)) 0.0 else sumSqRow.getLong(0).toDouble

    intra / m - sumSq / (4.0 * m * m)
  }
}

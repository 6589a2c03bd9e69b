package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete every
  * vertex whose (symmetric) degree is below k until the edge set is
  * stable; what survives is the maximal subgraph where every vertex
  * has ≥ k neighbors — the classic density filter a link-graph layer
  * runs before community detection or embedding (pruning the long
  * power-law tail that contributes volume but no structure).
  *
  * Deterministic and engine-replayable: each round is pure set
  * algebra (degree count → threshold → two semi-joins), so a DuckDB
  * twin unrolls the rounds bit-for-bit (`kcore_sql_graph`).
  *
  * Scale shape: per round ONE map-side-combinable degree aggregation
  * over the surviving edges plus two semi-joins against the skinny
  * alive set — the same exchange budget as a CC star round. Rounds
  * are bounded by the peeling depth (≤ max coreness; single digits on
  * power-law graphs), each round's edge set shrinks monotonically,
  * and per-round `freshCheckpoint` + `CheckpointGC` keep planning and
  * storage flat exactly as in [[ConnectedComponents]].
  */
object KCore {

  /** @param symEdges symmetrized undirected edges (both directions)
    * @return (id, core_deg) for vertices in the k-core, core_deg =
    *   degree counted WITHIN the core (≥ k by construction)
    */
  def run(spark: SparkSession,
          symEdges: DataFrame,
          k: Int,
          numPartitions: Int = 32,
          maxIter: Int = 100): DataFrame = Superstep.withoutAQE(spark) {

    var e = Superstep.freshCheckpoint(
      symEdges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")), eager = true)
    var size = e.count()
    var changed = true
    var iter = 0
    val gc = new Superstep.CheckpointGC(spark)

    while (changed && iter < maxIter) {
      val alive = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select(col("id"))
      val next = Superstep.freshCheckpoint(
        e.join(alive.select(col("id").as("src")).hint("shuffle_hash"),
            Seq("src"), "left_semi")
          .join(alive.select(col("id").as("dst")).hint("shuffle_hash"),
            Seq("dst"), "left_semi"), eager = false)
      val nextSize = next.count() // materializes the lazy checkpoint
      gc.tick()
      changed = nextSize != size
      e = next; size = nextSize; iter += 1
    }
    // a silently truncated peel would present sub-k degrees as the
    // k-core — fail loudly instead (sibling algos report `converged`)
    require(!changed,
      s"k-core peeling did not stabilize within $maxIter rounds — raise maxIter")
    gc.close()
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
  }
}

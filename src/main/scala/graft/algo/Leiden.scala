package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Leiden community detection: [[Louvain]]'s move/aggregate loop plus
  * the refinement guarantee that distinguishes leidenalg (the
  * reference's engine, community_detection.py:46-118; Traag, Waltman &
  * van Eck 2019) from classic Louvain — after every level's local-move
  * partition, each community is split into its connected parts before
  * aggregation, so NO community in the output (at any level) is
  * internally disconnected. Greedy local moves can strand a community
  * in pieces when a cut vertex migrates; Louvain freezes that mistake
  * into the coarse graph, Leiden repairs it every level.
  *
  * Deterministic and integer-exact like the rest of `graft.algo`: the
  * split is min-member-canonical connected components of the
  * same-community subgraph (the scale-safe small-star/large-star CC),
  * so a DuckDB twin replays the whole multi-level run bit-for-bit
  * (`leiden_sql_graph`).
  */
object Leiden {

  /** Same contract as [[Louvain.run]], with `connectSplit` on.
    * `gammaNum`/`gammaDen` expose leidenalg's RB-configuration
    * resolution parameter as an exact rational (γ = 1 default =
    * classic modularity, bit-identical to the pre-knob behavior).
    */
  def run(spark: SparkSession,
          symEdges: DataFrame,
          numPartitions: Int = 32,
          maxLevels: Int = 4,
          roundsPerLevel: Int = 4,
          weighted: Boolean = false,
          vertices: Option[DataFrame] = None,
          gammaNum: Long = 1L,
          gammaDen: Long = 1L): Louvain.Result =
    Louvain.run(spark, symEdges, numPartitions, maxLevels, roundsPerLevel,
      weighted, vertices, connectSplit = true,
      gammaNum = gammaNum, gammaDen = gammaDen)
}

package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.PageRank

/** Local community detection by sweep cut over a personalized-PageRank
  * ordering (PageRank–Nibble, Andersen–Chung–Lang 2006): run PPR from
  * the seed set, order vertices by rank/degree, and return the
  * conductance of every prefix S_k of the top-K — the k minimizing
  * φ(S_k) is the local cluster around the seeds. The GraphRAG
  * local-retrieval primitive: "the tight community around THIS
  * entity", found without touching the global partition.
  *
  * Exactness/determinism contract: the sweep ORDER is (round(rank, 6)
  * / degree) DESC, id ASC — the PPR ranks are cross-engine equal after
  * 6-dp rounding (the `ppr_sql_graph` oracle pins that), dividing the
  * rounded value by an exact integer degree is one IEEE-754 operation
  * on identical inputs, and the id tie-break settles rounded
  * collisions. Volumes and cuts are exact BIGINTs; only the final
  * conductance is floating (rounded 6 dp).
  *
  * Scale shape: the edge-scale work is the PPR itself plus ONE join of
  * the edges against the broadcast-sized top-K prefix (two semi-sided
  * hash joins, no shuffle of the edges beyond it) aggregated map-side
  * to ≤K rows. The only window runs over the K-row prefix frame
  * (single tiny partition by construction — K defaults to 64). Sweep
  * prefixes beyond K are not scored: at web scale the local cluster IS
  * small (that is the point of local clustering); raise K, not the
  * plan.
  */
object LocalCluster {

  /** @param symEdges symmetrized undirected edges, no self-loops
    * @param seeds    one-column (id) seed set for the PPR teleport
    * @param k        sweep width: prefixes S_1..S_K are scored
    * @param iters    fixed PPR supersteps (tol = 0, oracle-replayable)
    * @return (pos, id, vol, cut, conductance) for pos = 1..K, ordered —
    *         vol/cut exact BIGINTs over the DIRECTED symmetric rows
    *         (each undirected edge counted twice in vol, once per
    *         direction in cut's complement), conductance rounded 6 dp
    */
  def sweepCut(spark: SparkSession,
               symEdges: DataFrame,
               seeds: DataFrame,
               k: Int = 64,
               iters: Int = 5,
               numPartitions: Int = 32): DataFrame = {
    require(k > 0 && k <= 4096, s"sweep width must be in [1, 4096], got $k")
    val pr = PageRank.run(spark, symEdges, numPartitions, tol = 0.0,
      maxIter = iters, seeds = Some(seeds))
    val deg = symEdges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val scored = pr.ranks.join(deg, Seq("id"))
      .select(col("id"), col("deg"),
        (round(col("rank"), 6) / col("deg")).as("score"))

    // top-K prefix: TakeOrderedAndProject, then a K-row window for pos
    val top = scored.orderBy(col("score").desc, col("id").asc).limit(k)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    val prefix = top.withColumn("pos", row_number().over(w).cast("long"))
      .select(col("pos"), col("id"), col("deg"))
      .localCheckpoint(true)

    // internal directed rows attributed to the later endpoint's pos:
    // one edge-scale join against the broadcast K-row prefix, reduced
    // map-side to ≤K rows before anything crosses the wire
    val pu = prefix.select(col("id").as("src"), col("pos").as("pu"))
    val pv = prefix.select(col("id").as("dst"), col("pos").as("pv"))
    val internalAt = symEdges
      .join(broadcast(pu), Seq("src"))
      .join(broadcast(pv), Seq("dst"))
      .groupBy(greatest(col("pu"), col("pv")).as("pos"))
      .agg(count(lit(1)).as("internal"))

    val m2 = symEdges.count() // total directed rows = 2·|undirected|
    val cum = Window.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prefix
      .join(internalAt, Seq("pos"), "left")
      .withColumn("vol", sum(col("deg")).over(cum))
      .withColumn("cut", col("vol") - sum(coalesce(col("internal"),
        lit(0L))).over(cum))
      .select(col("pos"), col("id"), col("vol"), col("cut"),
        // φ(V) is undefined (no boundary): NULL, not a 0/0 ANSI error
        when(least(col("vol"), lit(m2) - col("vol")) === 0, lit(null))
          .otherwise(round(col("cut").cast("double") /
            least(col("vol"), lit(m2) - col("vol")).cast("double"), 6))
          .as("conductance"))
  }
}

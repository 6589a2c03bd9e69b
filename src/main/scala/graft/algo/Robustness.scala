package graft.algo

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.GraphOps

/** Network robustness profiles — the two classic failure curves of
  * Albert–Barabási ("Error and attack tolerance of complex networks",
  * Nature 2000) over a web-scale link graph:
  *
  *  - [[bondPercolation]]: RANDOM failure — each edge survives
  *    independently at rate num/den, how much of the graph stays in
  *    the giant component? (Scale-free graphs are famously resilient
  *    here: the giant persists down to tiny keep rates.)
  *  - [[degreeAttack]]: TARGETED failure — remove the highest-degree
  *    hubs first, same question. (The same graphs are famously
  *    fragile here — the attack curve collapses almost immediately.)
  *
  * Both are compositions of pinned shapes, no new exchange forms: a
  * codegen'd map-side keep predicate (the [[GraphOps.sampleKeep]]
  * double-quadratic scramble — deterministic, partitioning-invariant,
  * engine-replayable) + the O(log² n) small-star/large-star
  * [[ConnectedComponents]] + one component-grain count. One CC run
  * per requested point; the driver loop is over the HANDFUL of curve
  * points, never over data.
  *
  * The attack is parameterized by an absolute DEGREE CUTOFF, not a
  * top-k fraction: "drop every vertex with degree ≥ D" needs only the
  * degree table and a filter, where top-k would need a global rank.
  * The curve is the same curve, indexed by cutoff instead of removed
  * fraction (each row reports the removed count, so the fraction axis
  * is recoverable).
  *
  * Giant-component sizes are measured against the FULL vertex set of
  * the input graph: a vertex isolated by edge percolation (or left
  * edge-free by hub removal, for attack survivors) counts as a
  * singleton component, exactly as in the percolation literature.
  */
object Robustness {

  private val outSchema = StructType(Seq(
    StructField("num", LongType, nullable = false),
    StructField("den", LongType, nullable = false),
    StructField("kept_edges", LongType, nullable = false),
    StructField("components", LongType, nullable = false),
    StructField("giant", LongType, nullable = false)))

  private val attackSchema = StructType(Seq(
    StructField("cutoff", LongType, nullable = false),
    StructField("removed", LongType, nullable = false),
    StructField("kept_edges", LongType, nullable = false),
    StructField("components", LongType, nullable = false),
    StructField("giant", LongType, nullable = false)))

  /** Deterministic per-edge survival predicate: the sampleKeep
    * scramble over a canonical-pair fold u·1000003 + v (u < v, so the
    * key is orientation-free; BIGINT-safe to u ≈ 9·10¹² vertices).
    */
  private[graft] def edgeKeep(u: org.apache.spark.sql.Column,
                              v: org.apache.spark.sql.Column,
                              num: Long, den: Long, salt: Long) =
    GraphOps.sampleKeep(u * lit(1000003L) + v, num, den, salt)

  private def summarize(labels: DataFrame): (Long, Long) = {
    val row = labels.groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("components"), max(col("sz")).as("giant"))
      .collect()(0)
    (row.getLong(0), row.getLong(1))
  }

  /** Bond-percolation curve: one row per keep rate num/den.
    *
    * @param undirectedPairs one row per undirected edge, src < dst
    * @return (num, den, kept_edges, components, giant)
    */
  def bondPercolation(spark: SparkSession, undirectedPairs: DataFrame,
                      rates: Seq[(Long, Long)], salt: Long = 0L,
                      numPartitions: Int = 32): DataFrame = {
    val pairs = undirectedPairs.select(col("src"), col("dst"))
      .localCheckpoint(true)
    val vertices = pairs.select(col("src").as("id"))
      .union(pairs.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val rows = rates.map { case (num, den) =>
      val kept = pairs.filter(edgeKeep(col("src"), col("dst"), num, den, salt))
      val keptEdges = kept.count()
      val labels = ConnectedComponents.run(spark, kept, Some(vertices),
        numPartitions)
      val (comps, giant) = summarize(labels)
      Row(num, den, keptEdges, comps, giant)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), outSchema)
  }

  private val siteSchema = StructType(Seq(
    StructField("num", LongType, nullable = false),
    StructField("den", LongType, nullable = false),
    StructField("surviving", LongType, nullable = false),
    StructField("kept_edges", LongType, nullable = false),
    StructField("components", LongType, nullable = false),
    StructField("giant", LongType, nullable = false)))

  /** Site-percolation curve: each VERTEX survives independently at
    * num/den (the [[GraphOps.sampleKeep]] predicate — the same one
    * behind [[GraphOps.inducedSample]]), an edge needs both
    * endpoints. Components are measured over the SURVIVING vertex
    * set: removed vertices are gone, edge-stripped survivors are
    * singletons. The random-NODE-failure half of the
    * Albert–Barabási picture ([[bondPercolation]] is the link half).
    *
    * The scramble is deterministic, not unbiased: at very small
    * denominators (den = 2) the realized keep rate on structured id
    * ranges can drift from num/den by tens of percent — read the
    * `surviving` column, not the nominal rate, when plotting the
    * curve (same caveat as [[GraphOps.inducedSample]]).
    *
    * @return (num, den, surviving, kept_edges, components, giant)
    */
  def sitePercolation(spark: SparkSession, undirectedPairs: DataFrame,
                      rates: Seq[(Long, Long)], salt: Long = 0L,
                      numPartitions: Int = 32): DataFrame = {
    val pairs = undirectedPairs.select(col("src"), col("dst"))
      .localCheckpoint(true)
    val vertices = pairs.select(col("src").as("id"))
      .union(pairs.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val rows = rates.map { case (num, den) =>
      val survivors = vertices.filter(
        GraphOps.sampleKeep(col("id"), num, den, salt))
      val surviving = survivors.count()
      val kept = pairs.filter(
        GraphOps.sampleKeep(col("src"), num, den, salt) &&
        GraphOps.sampleKeep(col("dst"), num, den, salt))
      val keptEdges = kept.count()
      val (comps, giant) =
        if (surviving == 0) (0L, 0L)
        else summarize(ConnectedComponents.run(spark, kept, Some(survivors),
          numPartitions))
      Row(num, den, surviving, keptEdges, comps, giant)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), siteSchema)
  }

  /** Targeted-attack curve: one row per degree cutoff D — every
    * vertex with degree ≥ D is removed, components are measured over
    * the SURVIVING vertex set (attack survivors left edge-free are
    * singletons).
    *
    * @return (cutoff, removed, kept_edges, components, giant)
    */
  def degreeAttack(spark: SparkSession, undirectedPairs: DataFrame,
                   cutoffs: Seq[Long], numPartitions: Int = 32): DataFrame = {
    val pairs = undirectedPairs.select(col("src"), col("dst"))
      .localCheckpoint(true)
    val deg = pairs.select(col("src").as("id"))
      .union(pairs.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val totalV = deg.count()
    val rows = cutoffs.map { cutoff =>
      val survivors = deg.filter(col("d") < cutoff).select(col("id"))
      val surviving = survivors.count()
      val kept = pairs
        .join(survivors.withColumnRenamed("id", "src").hint("shuffle_hash"),
          Seq("src"), "left_semi")
        .join(survivors.withColumnRenamed("id", "dst").hint("shuffle_hash"),
          Seq("dst"), "left_semi")
      val keptEdges = kept.count()
      val labels = ConnectedComponents.run(spark, kept, Some(survivors),
        numPartitions)
      val (comps, giant) =
        if (surviving == 0) (0L, 0L) else summarize(labels)
      Row(cutoff, totalV - surviving, keptEdges, comps, giant)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), attackSchema)
  }
}

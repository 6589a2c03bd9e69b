package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

import graft.algo.Superstep

/** Degree–degree mixing of a directed link graph — Newman's four
  * directed assortativity coefficients (Pearson correlation of
  * endpoint degrees over edges, one per (source-degree-kind ×
  * target-degree-kind) combination) plus the average-neighbor-degree
  * curve knn(k). The web-graph signature pair: a spam farm shows
  * strongly disassortative out–in mixing (high-out pages pointing at
  * low-in pages), a citation core shows assortative in–in; knn(k)'s
  * slope is the standard "rich club vs rich-poor" read at degree
  * grain.
  *
  * Exactness discipline: all sums and cross-moments accumulate in
  * DECIMAL(38,0) (degree products pass 2⁶³ long before 10¹² edges),
  * the Pearson numerator/denominators finish in driver-side BigInt on
  * ONE collected row, and each coefficient is a single double
  * division of exactly-computed integers (sqrt is IEEE
  * correctly-rounded in both engines). Zero-variance sides yield
  * null, not NaN.
  */
object DegreeMixing {

  val Modes: Seq[String] = Seq("out-in", "out-out", "in-in", "in-out")

  private val Dec = "decimal(38,0)"

  /** Four directed assortativity coefficients over the edge table.
    *
    * @param edges directed (src, dst); dedup'd, self-loops dropped
    * @return (mode, r) — 4 rows, r null when a side has zero variance
    */
  def assortativity(spark: SparkSession,
                    edges: DataFrame,
                    numPartitions: Int = 32): DataFrame = {
    val e = Superstep.freshCheckpoint(
      edges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(numPartitions, col("src")), eager = true)
    val outd = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("od"))
    val ind = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("idg"))

    // excess-degree convention: the edge itself is excluded from its
    // own endpoints' correlated degrees (ou−? NO — Newman's directed r
    // uses the full out-/in-degree of the endpoints; no excess shift)
    val j = e
      .join(outd.select(col("id").as("src"), col("od").as("ou"))
        .hint("shuffle_hash"), Seq("src"))
      .join(ind.select(col("id").as("src"), col("idg").as("iu"))
        .hint("shuffle_hash"), Seq("src"), "left")
      .join(outd.select(col("id").as("dst"), col("od").as("ov"))
        .hint("shuffle_hash"), Seq("dst"), "left")
      .join(ind.select(col("id").as("dst"), col("idg").as("iv"))
        .hint("shuffle_hash"), Seq("dst"))
      .select(col("ou"), coalesce(col("iu"), lit(0L)).as("iu"),
        coalesce(col("ov"), lit(0L)).as("ov"), col("iv"))

    def d(c: org.apache.spark.sql.Column) = c.cast(Dec)
    val r = j.agg(
      count(lit(1)).as("m"),
      sum(d(col("ou"))).as("sou"), sum(d(col("ou")) * col("ou")).as("sou2"),
      sum(d(col("iu"))).as("siu"), sum(d(col("iu")) * col("iu")).as("siu2"),
      sum(d(col("ov"))).as("sov"), sum(d(col("ov")) * col("ov")).as("sov2"),
      sum(d(col("iv"))).as("siv"), sum(d(col("iv")) * col("iv")).as("siv2"),
      sum(d(col("ou")) * col("iv")).as("xoi"),
      sum(d(col("ou")) * col("ov")).as("xoo"),
      sum(d(col("iu")) * col("iv")).as("xii"),
      sum(d(col("iu")) * col("ov")).as("xio")).first()
    Superstep.freeCheckpoint(e)

    val m = BigInt(r.getLong(0))
    def big(i: Int): BigInt =
      if (r.isNullAt(i)) BigInt(0) else BigInt(r.getDecimal(i).toBigInteger)
    def pearson(sx: BigInt, sx2: BigInt, sy: BigInt, sy2: BigInt,
                sxy: BigInt): Option[Double] = {
      val num = m * sxy - sx * sy
      val dx = m * sx2 - sx * sx
      val dy = m * sy2 - sy * sy
      if (dx == 0 || dy == 0) None
      else Some(num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
    }
    val (sou, sou2) = (big(1), big(2)); val (siu, siu2) = (big(3), big(4))
    val (sov, sov2) = (big(5), big(6)); val (siv, siv2) = (big(7), big(8))
    val rs = Seq(
      "out-in" -> pearson(sou, sou2, siv, siv2, big(9)),
      "out-out" -> pearson(sou, sou2, sov, sov2, big(10)),
      "in-in" -> pearson(siu, siu2, siv, siv2, big(11)),
      "in-out" -> pearson(siu, siu2, sov, sov2, big(12)))
    val rows = rs.map { case (mode, v) =>
      Row(mode, v.map(x => math.rint(x * 1e6) / 1e6).orNull)
    }
    val schema = StructType(Seq(
      StructField("mode", StringType, nullable = false),
      StructField("r", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Average neighbor degree per degree class over the UNDIRECTED
    * graph: knn(k) = (Σ_{v: deg v = k} Σ_{u∈N(v)} deg u) / (k·|{v :
    * deg v = k}|) — the constant-k factoring keeps every division out
    * of the aggregation (one exact integer numerator and denominator
    * per class, one double division each). Output rows = distinct
    * degree values = O(√m).
    *
    * @param symEdges symmetrized edges
    * @return (k, vertices, knn)
    */
  def avgNeighborDegree(spark: SparkSession,
                        symEdges: DataFrame,
                        numPartitions: Int = 32): DataFrame = {
    val e = Superstep.freshCheckpoint(
      symEdges.select(col("src"), col("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(numPartitions, col("src")), eager = true)
    val deg = Superstep.freshCheckpoint(
      e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .repartition(numPartitions, col("id")), eager = true)
    // Σ neighbor degree per vertex: one edges⨝degree join, map-side
    // partial sum keyed by the other endpoint
    val nsum = e.join(deg.select(col("id").as("dst"), col("deg").as("nd"))
        .hint("shuffle_hash"), Seq("dst"))
      .groupBy(col("src").as("id"))
      .agg(sum(col("nd").cast(Dec)).as("nsum"))
    val out = deg.join(nsum.hint("shuffle_hash"), Seq("id"))
      .groupBy(col("deg").as("k"))
      .agg(count(lit(1)).as("vertices"), sum(col("nsum")).as("tot"))
      .select(col("k"), col("vertices"),
        // k·vertices can pass 2⁶³ — multiply as doubles
        round(col("tot").cast("double")
          / (col("k").cast("double") * col("vertices")), 6).as("knn"))
    val res = Superstep.freshCheckpoint(out, eager = true)
    Seq(e, deg).foreach(Superstep.freeCheckpoint)
    res
  }
}

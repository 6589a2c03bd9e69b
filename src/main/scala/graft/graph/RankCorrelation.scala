package graft.graph

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Spearman rank correlation between two per-vertex (or per-document)
  * integer scores — the ranking-agreement probe: "does the cheap
  * ranking (degree) order the corpus the way the expensive one
  * (PageRank, quality score) does?", the standard decision input for
  * replacing an O(E·iters) signal with an O(E) one at 100 TB.
  *
  * Exactness discipline: ranks are computed at VALUE GRAIN — one row
  * per distinct score, average-rank ties doubled into integers
  * (rank2 = 2·cumBefore + cnt + 1, the exact 2×average competition
  * rank) — so the only window in the plan runs over the distinct-value
  * table, never the corpus (the sweep-cut/ANF ≤K-row discipline; for
  * integer graph scores distinct values are O(√m) by the
  * degree-sequence bound). Moments accumulate in DECIMAL(38,0)
  * (rank products pass 2⁶³ at ~2⁶³^⅓ ≈ 2 M rows), Pearson-on-ranks
  * finishes in driver BigInt on ONE collected row, one double
  * division (√ is IEEE correctly-rounded both engines), 6dp rint —
  * the DegreeMixing finish, verbatim.
  *
  * Designed for integer or pre-gridded scores: callers with
  * continuous scores round to a grid first (the proven 6dp grain),
  * accepting grid-tie semantics.
  */
object RankCorrelation {

  private val Dec = "decimal(38,0)"

  /** 2× average (fractional) rank per row, ascending by `scoreCol`:
    * exact integers, ties share the mean rank. The frame returned is
    * `df` plus `rank2`.
    */
  def rank2(df: DataFrame, scoreCol: String, outCol: String): DataFrame = {
    val grain = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("cnt"))
    // the one window: over the distinct-value table only
    val w = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = grain
      .select(col(scoreCol), col("cnt"),
        (sum(col("cnt")).over(w) - col("cnt")).as("cumBefore"))
      .select(col(scoreCol),
        (lit(2L) * col("cumBefore") + col("cnt") + 1L).as(outCol))
    df.join(ranked, Seq(scoreCol))
  }

  /** Spearman rho between `aCol` and `bCol` over `df` (one row per
    * entity). Returns a 1-row frame (n_rows, rho); rho is null when
    * either side is constant.
    */
  def spearman(spark: SparkSession, df: DataFrame,
               aCol: String, bCol: String): DataFrame = {
    val ranked = rank2(rank2(df.select(col(aCol), col(bCol)), aCol, "ra"),
      bCol, "rb")
    def d(c: Column) = c.cast(Dec)
    val r = ranked.agg(
      count(lit(1)).as("n"),
      sum(d(col("ra"))).as("sa"), sum(d(col("ra")) * col("ra")).as("sa2"),
      sum(d(col("rb"))).as("sb"), sum(d(col("rb")) * col("rb")).as("sb2"),
      sum(d(col("ra")) * col("rb")).as("sab")).first()

    val n = BigInt(r.getLong(0))
    def big(i: Int): BigInt =
      if (r.isNullAt(i)) BigInt(0) else BigInt(r.getDecimal(i).toBigInteger)
    val (sa, sa2, sb, sb2, sab) = (big(1), big(2), big(3), big(4), big(5))
    val num = n * sab - sa * sb
    val dx = n * sa2 - sa * sa
    val dy = n * sb2 - sb * sb
    val rho: Option[Double] =
      if (dx == 0 || dy == 0) None
      else Some(num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))

    val rows = Seq(Row(n.toLong, rho.map(x => math.rint(x * 1e6) / 1e6).orNull))
    val schema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("rho", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Kendall τ-b between `aCol` and `bCol` — the concordance view of
    * the same question (Spearman weighs by rank distance, τ by pair
    * orientation only; report both when the rankings disagree on the
    * tail). Exact at CONTINGENCY grain: the joint (a, b) value table
    * carries one count per distinct score pair, concordant/discordant
    * totals come from a strict upper-triangle self-join of that table
    * (O(cells²) pairs — cells ≈ √m·√m at integer graph scores, never
    * corpus rows), tie terms from the marginals, and
    * τ-b = (C − D)/√((T − n1)(T − n2)) finishes in driver BigInt with
    * T = n(n−1)/2. No window at all in this plan.
    */
  def kendall(spark: SparkSession, df: DataFrame,
              aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    def d(c: Column) = c.cast(Dec)
    val pairAgg = cells.as("x").join(cells.as("y"),
        col("x.a") < col("y.a") ||
        (col("x.a") === col("y.a") && col("x.b") < col("y.b")))
      .select(
        when(col("x.a") < col("y.a") && col("x.b") < col("y.b"),
          d(col("x.c")) * col("y.c")).otherwise(lit(0)).as("conc"),
        when(col("x.a") < col("y.a") && col("x.b") > col("y.b"),
          d(col("x.c")) * col("y.c")).otherwise(lit(0)).as("disc"))
      .agg(sum(col("conc")).as("cc"), sum(col("disc")).as("dd")).first()

    // tie terms ×2 (cnt·(cnt−1) sums stay integral in DECIMAL; the
    // halving happens in driver BigInt)
    val na = cells.groupBy(col("a")).agg(sum(col("c")).as("cnt"))
      .agg(sum(d(col("cnt")) * (col("cnt") - 1)).as("t2")).first()
    val nb = cells.groupBy(col("b")).agg(sum(col("c")).as("cnt"))
      .agg(sum(d(col("cnt")) * (col("cnt") - 1)).as("t2")).first()
    val nRow = df.agg(count(lit(1)).as("n")).first()

    def big(r: Row, i: Int): BigInt =
      if (r.isNullAt(i)) BigInt(0) else BigInt(r.getDecimal(i).toBigInteger)
    val n = BigInt(nRow.getLong(0))
    val (cc, dd) = (big(pairAgg, 0), big(pairAgg, 1))
    val (n1, n2) = (big(na, 0) / 2, big(nb, 0) / 2)
    val t = n * (n - 1) / 2
    val tau: Option[Double] =
      if (t == n1 || t == n2) None
      else Some((cc - dd).toDouble /
        (math.sqrt((t - n1).toDouble) * math.sqrt((t - n2).toDouble)))

    val rows = Seq(Row(n.toLong, tau.map(x => math.rint(x * 1e6) / 1e6).orNull))
    val schema = StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("tau_b", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}

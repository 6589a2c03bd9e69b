package graft.curation

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT order statistics at sketch cost — the "exact median of a
  * 100 TB column" shape. A full `orderBy` is a global sort; a plain
  * `percentile` aggregate collects the column per group. Neither
  * survives scale. The standard pattern is sketch-narrow-finish:
  *
  *  1. an approximate quantile sketch (Spark's built-in
  *     Greenwald–Khanna `approxQuantile`, rank error ≤ ε·n) brackets
  *     the target rank between two values [lo, hi] — one pass;
  *  2. one exact count fixes the rank offset below the bracket — one
  *     pass over the scan (with pushed min/max pruning);
  *  3. the bracket slice — whose size the GK guarantee bounds by
  *     ~4ε·n rows — is resolved exactly by a grouped cumulative count
  *     over its DISTINCT values. If the slice is still too wide (very
  *     heavy value skew), the loop re-sketches INSIDE the bracket, so
  *     each iteration multiplies the slice by ~ε.
  *
  * The result is the exact k-th smallest (k = ⌈n·num/denom⌉,
  * 1-indexed) — deterministic, partitioning-independent, and cheap to
  * twin in any SQL engine (`row_number() = k` over the sorted column).
  *
  * Quantile fractions are RATIONALS (num/denom), not doubles: ⌈q·n⌉
  * under IEEE rounding differs between engines for innocent-looking
  * q (0.9·1000 = 900.0000000000001), while ⌈n·num/denom⌉ is exact
  * integer arithmetic everywhere — the same cross-engine discipline as
  * the hash-threshold oracles.
  */
object Quantiles {

  /** Exact k-th smallest value of `valueCol` for each (num, denom)
    * fraction: k = ⌈n·num/denom⌉ clamped to ≥ 1. Returns one row per
    * fraction: (q_num, q_denom, k, value), value as BIGINT.
    *
    * @param maxExact slice sizes at or below this resolve in one
    *                 grouped-cumsum finish; above it the loop
    *                 re-sketches within the slice first
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     qs: Seq[(Int, Int)],
                     maxExact: Long = 1000000L,
                     epsilon: Double = 0.001): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("long").as("v")).where(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, "exactQuantiles over an empty frame")
    val rows = qs.map { case (num, denom) =>
      require(num > 0 && num <= denom, s"fraction $num/$denom out of (0,1]")
      val k = math.max(1L, (n * num + denom - 1) / denom)
      Row(num, denom, k, kthSmallest(vals, k, n, maxExact, epsilon))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_num",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("q_denom",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** The narrowing loop: exact k-th smallest of a one-column ("v")
    * long frame of `total` rows.
    */
  private def kthSmallest(vals: DataFrame, k: Long, total: Long,
                          maxExact: Long, epsilon: Double): Long = {
    var slice = vals
    var target = k // rank within the current slice
    var size = total
    var guard = 0
    while (size > maxExact && guard < 8) {
      guard += 1
      val q = target.toDouble / size.toDouble
      // GK guarantee: rank(AQ(p)) ∈ [(p−ε)n, (p+ε)n] ⇒ bracketing
      // probes at p ∓ 2ε have rank strictly below / above the target
      val lo = math.max(0.0, q - 2 * epsilon)
      val hi = math.min(1.0, q + 2 * epsilon)
      val Array(vLo, vHi) =
        slice.stat.approxQuantile("v", Array(lo, hi), epsilon)
      val below = slice.where(col("v") < vLo.toLong).count()
      val next = slice.where(col("v") >= vLo.toLong && col("v") <= vHi.toLong)
      val nextSize = next.count()
      if (below < target && below + nextSize >= target && nextSize < size) {
        slice = next
        target -= below
        size = nextSize
      } else {
        // degenerate bracket (extreme skew): fall through to the
        // exact finish on the current slice
        guard = 8
      }
    }
    // exact finish: cumulative counts over the slice's DISTINCT values
    // (the single-partition window runs over ≤ |distinct slice| rows)
    val grouped = slice.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val cum = grouped.withColumn("cum",
      sum(col("c")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.where(col("cum") >= target).orderBy(col("v")).limit(1)
      .head().getLong(0)
  }

  /** Exact per-group k-th smallest (k = ⌈n_g·num/denom⌉ per group):
    * (group, n_rows, k, value). One grouped count + one
    * per-group-partitioned cumulative window over DISTINCT (group,
    * value) pairs — scale-safe when per-group distinct values are
    * bounded (lengths, scores, bucketed metrics); for corpus-scale
    * value domains use [[exactQuantiles]] per group instead.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     num: Int, denom: Int): DataFrame = {
    require(num > 0 && num <= denom, s"fraction $num/$denom out of (0,1]")
    val g = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n_rows",
        sum(col("c")).over(Window.partitionBy(col("grp"))))
    cum.withColumn("k",
        // `div` = integer division (Column./ is double division)
        expr(s"(n_rows * $num + $denom - 1) div $denom"))
      .where(col("cum") >= col("k"))
      .groupBy(col("grp"), col("n_rows"), col("k"))
      .agg(min(col("v")).as("value"))
      .select(col("grp").as(groupCol), col("n_rows"), col("k"), col("value"))
  }
}

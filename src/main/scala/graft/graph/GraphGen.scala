package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic R-MAT graph synthesis (Chakrabarti–Zhan–Faloutsos,
  * SDM 2004 — the Graph500 generator): each edge walks `scale`
  * recursion levels, picking an adjacency-matrix quadrant per level
  * with rational probabilities a:b:c:d, which yields the power-law
  * degree skew and community-like self-similarity real link graphs
  * show. The scale-test source for every superstep operator here —
  * bit-identical at any parallelism and replayable in plain SQL:
  * the per-(edge, level) draw is the 31-bit Knuth mixer reduced mod
  * `denom`, all integer arithmetic.
  *
  * Plan shape: one `spark.range(numEdges)` scan + two per-row array
  * folds — map-only, no shuffle, no RNG state. 10¹² edges is 10¹²
  * rows of codegen'd arithmetic, embarrassingly parallel.
  */
object GraphGen {

  /** @param scale vertex-id bits: 2^scale vertices
    * @param quadrants (a, b, c, d) numerators; probabilities are
    *   quadrant/denom, a+b+c+d must equal denom. Defaults are the
    *   Graph500 57:19:19:5.
    * @return (id, src, dst) — id = the generating edge index
    */
  def rmat(spark: SparkSession,
           scale: Int,
           numEdges: Long,
           quadrants: (Long, Long, Long, Long) = (57L, 19L, 19L, 5L),
           denom: Long = 100L,
           salt: Long = 42L): DataFrame = {
    val (a, b, c, d) = quadrants
    require(a + b + c + d == denom, s"quadrants must sum to denom=$denom")
    require(scale >= 1 && scale <= 40, s"scale out of range: $scale")

    // Non-linear per-(edge, level) draw: the Mis double-quadratic
    // scramble mod 2³¹−1 (every operand < 2⁶², exact in any 64-bit
    // engine). An affine mixer here leaves one edge's level draws on a
    // fixed arithmetic progression — quadrant picks correlate and the
    // degree skew stops matching true R-MAT statistics (ADVICE r3).
    def draw(id: Column, l: Column): Column = {
      val P = 2147483647L // 2^31 - 1
      val vp = pmod(id * lit(40503L) + l * lit(131L) + lit(salt), lit(P))
      val q1 = pmod(vp * (vp + lit(3L)), lit(P))
      val q2 = pmod(q1 * (q1 + lit(7L)), lit(P))
      q2 % lit(denom)
    }

    // quadrant -> (srcBit, dstBit): a=(0,0), b=(0,1), c=(1,0), d=(1,1)
    def srcBit(r: Column): Column =
      when(r < lit(a + b), lit(0L)).otherwise(lit(1L))
    def dstBit(r: Column): Column =
      when(r < lit(a), lit(0L))
        .when(r < lit(a + b), lit(1L))
        .when(r < lit(a + b + c), lit(0L))
        .otherwise(lit(1L))

    def fold(bit: Column => Column): Column =
      aggregate(sequence(lit(0), lit(scale - 1)),
        lit(0L), (acc, l) => acc * 2 + bit(draw(col("id"), l)))

    spark.range(numEdges).select(col("id"),
      fold(srcBit).as("src"), fold(dstBit).as("dst"))
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized Indel similarity, 0..100 — rapidfuzz `fuzz.ratio` parity.
  *
  * The reference fuzzy-matches industry variants / glossary terms with
  * rapidfuzz (industry_taxonomy.py:279-307 thresholds 80/75,
  * glossary_linker.py:88-99 threshold 85). fuzz.ratio is the normalized
  * Indel (insert/delete-only) metric, NOT Levenshtein:
  *
  *   ratio(a, b) = 100 * 2*LCS(a, b) / (|a| + |b|)
  *
  * Spark's built-in `levenshtein` counts substitutions as cost 1 and is
  * a different metric, so this is the one genuinely custom scalar the
  * engine needs. Implemented as a native codegen'd Catalyst expression
  * (no Scala UDF): wholestage codegen emits a direct static call into
  * [[IndelRatio.ratio]].
  */
case class IndelRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "indel_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IndelRatio.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IndelRatio.ratio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IndelRatio =
    copy(left = newLeft, right = newRight)
}

object IndelRatio {

  /** 100 * (1 - indel_distance/(|a|+|b|)); 100.0 when both empty
    * (rapidfuzz convention). Two-row LCS DP, O(|a|*|b|) time,
    * O(min) extra space.
    */
  def ratio(a: UTF8String, b: UTF8String): Double =
    ratio(a.toString, b.toString)

  def ratio(sa: String, sb: String): Double = {
    val (a, b) = if (sa.length <= sb.length) (sa, sb) else (sb, sa)
    val n = a.length
    val m = b.length
    if (n + m == 0) return 100.0
    if (n == 0) return 0.0
    val prev = new Array[Int](n + 1)
    val cur = new Array[Int](n + 1)
    var j = 1
    while (j <= m) {
      val bj = b.charAt(j - 1)
      var i = 1
      while (i <= n) {
        cur(i) =
          if (a.charAt(i - 1) == bj) prev(i - 1) + 1
          else math.max(prev(i), cur(i - 1))
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, n + 1)
      j += 1
    }
    100.0 * (2.0 * prev(n)) / (n + m).toDouble
  }
}

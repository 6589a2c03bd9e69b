package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact squared L2 distance of two integerized (array<long>) vectors —
  * the inner kernel of the exact-parity similarity family (k-means
  * assignment, k-center, NN-Descent graph build, beam search).
  *
  * The HOF form (`aggregate(zip_with(...))`) is a CodegenFallback:
  * per evaluation it allocates the zipped array and walks two
  * interpreted lambda chains, which made the interpreted distance the
  * dominant NN-Descent cost (ProbeKnn r4: 0.4 M pair-evals/s). This
  * is the [[CosineSim]] treatment: one allocation-free loop reduced
  * to a static call under whole-stage codegen. The arithmetic is the
  * same left-to-right BIGINT accumulation, so every oracle row is
  * unchanged.
  *
  * Inputs must be equal-length array<long> with non-null elements
  * (the `Coreset.intVec` contract).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SqDistLong.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SqDistLong.dist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  def dist(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    // fail fast on ragged inputs (ADVICE r4): the old HOF fallback
    // surfaced a length-mismatch upstream bug as a visible NULL;
    // silently truncating to the shorter array would instead return a
    // plausible-but-wrong distance to every sqDist caller. The check
    // is O(1) against the O(dims) loop.
    require(n == b.numElements(),
      s"sq_dist_long: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }
}

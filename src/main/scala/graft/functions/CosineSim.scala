package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two float-vector columns in double precision —
  * the inner kernel of every similarity-family operator (brute-force /
  * IVF top-k, embedding-cosine near-dup LSH verify).
  *
  * The HOF form (`aggregate(zip_with(...))` ×3) is a CodegenFallback:
  * each evaluation walks three interpreted lambda chains and allocates
  * intermediate arrays, which made the interpreted cosine the dominant
  * cost of the whole family (BENCH r2). This expression is a single
  * allocation-free loop reduced to a static call under whole-stage
  * codegen. Math is kept bit-identical to the HOF form: per-element
  * float→double widening, left-to-right summation, `dot/(√na·√nb)`,
  * and 0.0 when either norm is zero — so scores (and 5dp-rounded
  * oracle rows) are unchanged.
  *
  * Inputs must be equal-length array<float> with non-null elements
  * (the embeddings contract).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // tails beyond the common prefix only contribute to their own norm
    var j = n
    while (j < a.numElements()) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getFloat(j).toDouble; nb += y * y; j += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }
}

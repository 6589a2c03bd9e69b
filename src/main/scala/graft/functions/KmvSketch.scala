package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch buffer: the k smallest
  * DISTINCT long values seen so far (Bar-Yossef et al. 2002). Unlike
  * [[TopKBuffer]] it dedupes on insert — KMV's estimator
  * (k−1)/normalized kth-minimum is only valid over distinct hash
  * values, and in neighborhood-function iteration the same ball
  * member arrives via many neighbors. Inserts short-circuit on the
  * current max before the dedup scan, so the common miss is O(1).
  */
final class KmvBuffer(val k: Int) extends Serializable {
  val vs = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit = {
    if (size == k) {
      var w = 0
      var i = 1
      while (i < size) { if (vs(i) > vs(w)) w = i; i += 1 }
      if (v >= vs(w)) return // full and not smaller than the max
      var j = 0
      while (j < size) { if (vs(j) == v) return; j += 1 }
      vs(w) = v
    } else {
      var j = 0
      while (j < size) { if (vs(j) == v) return; j += 1 }
      vs(size) = v; size += 1
    }
  }

  /** Ascending copy of the live entries. */
  def sorted: Array[Long] = {
    val out = java.util.Arrays.copyOf(vs, size)
    java.util.Arrays.sort(out)
    out
  }
}

object KmvBuffer {
  def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 8)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vs(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.vs(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }
}

/** `kmv_min(value, k)` — per-group k smallest distinct longs as a
  * TypedImperativeAggregate: PARTIAL aggregation bounds every map-side
  * output to ≤ k values per (partition, group), so the exchange
  * carries O(parts·k) rows per group no matter how many duplicates a
  * high-degree vertex's neighborhood contributes. Returns an ascending
  * array<long> — deterministic, engine-independent (a SQL twin is
  * `row_number() OVER (PARTITION BY g ORDER BY v) <= k` over distinct
  * values).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0 && k <= 4096, s"kmv_min k must be in [1, 4096], got $k")

  override def prettyName: String = "kmv_min"
  override def nullable: Boolean = false
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.vs(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any = new GenericArrayData(buf.sorted)

  override def serialize(buf: KmvBuffer): Array[Byte] = KmvBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

/** `kmv_merge(sketch, k)` — union of KMV sketches (each an ascending
  * array<long> as produced by [[KmvSketch]] / a singleton init array):
  * the k smallest distinct values across every input array. This is
  * the HyperBall superstep kernel: merging a vertex's ball sketch with
  * all its neighbors' is ONE partial-bounded aggregation, so the
  * per-round exchange carries ≤ k longs per (partition, vertex)
  * regardless of degree — the KMV analogue of HLL register-max
  * merging (Boldi–Vigna HyperBall; see PAPERS.md).
  */
case class KmvMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0 && k <= 4096, s"kmv_merge k must be in [1, 4096], got $k")

  override def prettyName: String = "kmv_merge"
  override def nullable: Boolean = false
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) { buf.insert(a.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.vs(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any = new GenericArrayData(buf.sorted)

  override def serialize(buf: KmvBuffer): Array[Byte] = KmvBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuffer = KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KmvMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvMerge =
    copy(child = newChild)
}

/** `mix64(x)` — the murmur3/splitmix avalanche ([[SigHash.mix]]) as a
  * codegen'd column: a BIJECTION on 64-bit longs, so `count distinct`
  * is invariant under it while the images are uniform enough for the
  * KMV order statistics. Built-ins can't express it under ANSI mode
  * (the wraparound multiplies would throw on overflow).
  */
case class Mix64(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mix64"

  override protected def nullSafeEval(input: Any): Any =
    SigHash.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigHash.mix($c)")

  override protected def withNewChildInternal(newChild: Expression): Mix64 =
    copy(child = newChild)
}

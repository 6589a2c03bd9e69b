package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation buffer: keeps the k best (score, id) pairs
  * by (score DESC, id ASC). Inserts are O(1) until full, O(k) on
  * replacement — k is small (5..100), and most rows fail the
  * current-worst check immediately.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    // idempotent on exact (score, id) duplicates: callers may feed the
    // same scored pair from several branches (NN-Descent's kept list ∪
    // regenerated candidates), and a duplicate occupying two slots
    // would evict a genuine k-th entry. The scan shares the loop that
    // finds the replacement victim, so inserts stay O(k).
    var dup = false
    var i = 0
    while (i < size) {
      if (scores(i) == s && ids(i) == id) dup = true
      i += 1
    }
    if (dup) return
    if (size < k) { scores(size) = s; ids(size) = id; size += 1 }
    else {
      var w = 0
      i = 1
      while (i < size) {
        if (better(scores(w), ids(w), scores(i), ids(i))) w = i
        i += 1
      }
      if (better(s, id, scores(w), ids(w))) { scores(w) = s; ids(w) = id }
    }
  }

  /** Indices sorted by (score desc, id asc). */
  def sortedIdx: Array[Int] =
    (0 until size).sortBy(i => (-scores(i), ids(i))).toArray
}

/** `bounded_topk(score, id, k)` — per-group top-k as a
  * TypedImperativeAggregate, so PARTIAL aggregation bounds every
  * map-side output to ≤ k pairs per (partition, group): the shuffle
  * carries O(parts·k) rows per group instead of the full scored set
  * (the VERDICT r1 fix for bruteForceTopK's |Q|·N window exchange).
  * Returns array<struct<score double, id bigint>> sorted
  * (score desc, id asc) — deterministic, engine-independent.
  */
case class BoundedTopK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  override def prettyName: String = "bounded_topk"
  override def nullable: Boolean = false
  // (no explicit result type: AbstractDataType is private[sql])
  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedIdx.map(i =>
      InternalRow(buf.scores(i), buf.ids(i))): Array[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1 }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}

package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982) with the
  * mergeable-summaries combine rule (Agarwal et al., PODS 2012): at
  * most `capacity` counters; a miss on a full buffer decrements every
  * counter (dropping zeros), and merging two summaries adds counters
  * pointwise, then subtracts the (capacity+1)-th largest count and
  * drops the non-positives. Both operations preserve the deficit
  * invariant
  *
  *   true_count(x) − counter(x) ≤ N / (capacity + 1)
  *
  * over the total stream length N covered so far (absent counters
  * count as zero), REGARDLESS of partition boundaries or merge order.
  * Consequence: every item with true frequency > N/(capacity+1) is
  * present in the final summary — the summary is a guaranteed
  * candidate superset for exact heavy hitters, which a cheap second
  * exact-count pass then confirms (see [[graft.text.HeavyHitters]]).
  */
final class MgBuffer(val capacity: Int) extends Serializable {
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def insert(item: String): Unit = {
    if (counts.containsKey(item)) {
      counts.put(item, counts.get(item) + 1L)
    } else if (counts.size < capacity) {
      counts.put(item, 1L)
    } else {
      // classic MG step: charge the miss against every live counter
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Pointwise-add `other`, then shrink back to ≤ capacity by the
    * subtract-(capacity+1)-th-largest rule.
    */
  def merge(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = if (counts.containsKey(e.getKey)) counts.get(e.getKey) else 0L
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vs = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vs(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vs)
      // (capacity+1)-th largest = index size-capacity-1 of the ascending sort
      val m = vs(counts.size - capacity - 1)
      val ci = counts.entrySet().iterator()
      while (ci.hasNext) {
        val e = ci.next()
        if (e.getValue <= m) ci.remove() else e.setValue(e.getValue - m)
      }
    }
  }

  /** Ascending item list (determinism of the emitted array only — the
    * candidate SET is what carries the guarantee).
    */
  def sortedItems: Array[String] = {
    val out = counts.keySet().toArray(new Array[String](counts.size))
    java.util.Arrays.sort(out.asInstanceOf[Array[AnyRef]])
    out
  }
}

object MgBuffer {
  def serialize(buf: MgBuffer): Array[Byte] = {
    var bytes = 8
    val entries = new Array[(Array[Byte], Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (b, e.getValue)
      bytes += 12 + b.length
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.capacity).putInt(entries.length)
    i = 0
    while (i < entries.length) {
      bb.putInt(entries(i)._1.length).put(entries(i)._1).putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.counts.put(new String(sb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }
}

/** `mg_candidates(item, capacity)` — the Misra–Gries candidate set as
  * an ascending array<string>. PARTIAL aggregation bounds every
  * map-side buffer (and thus the exchange) to ≤ capacity entries per
  * partition no matter how large the item domain is — the full-vocab
  * `groupBy(item)` this replaces shuffles every distinct key. The
  * result is a guaranteed superset of the items with frequency
  * > N/(capacity+1); it is NOT itself deterministic across partition
  * layouts (extra sub-threshold candidates may differ), so callers
  * must finish with an exact count pass (see
  * [[graft.text.HeavyHitters.frequentItems]]) rather than emit it.
  */
case class MgCandidates(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(capacity > 0 && capacity <= 65536,
    s"mg_candidates capacity must be in [1, 65536], got $capacity")

  override def prettyName: String = "mg_candidates"
  override def nullable: Boolean = false
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val items = buf.sortedItems
    val out = new Array[Any](items.length)
    var i = 0
    while (i < items.length) { out(i) = UTF8String.fromString(items(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = MgBuffer.serialize(buf)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MgCandidates =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgCandidates =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MgCandidates =
    copy(child = newChild)
}

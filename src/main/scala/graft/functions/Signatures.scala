package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass signature expressions for the dedup family.
  *
  * The composable-HOF formulations (`transform`/`aggregate` over a
  * shingle array) are correct but materialize the shingle array and
  * re-scan it once per permutation / per bit — 32× (MinHash) to 64×
  * (SimHash) more work than needed. These native expressions make ONE
  * pass over the text and are the hot path at 100 TB; whole-stage
  * codegen emits a static call, no boxing.
  */

/** FNV-1a–style 64-bit rolling hash helpers shared by the signatures. */
object SigHash {
  final val P: Long = 2147483647L // 2^31-1

  /** xxhash-inspired avalanche of a 64-bit value. */
  @inline def mix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Hash of bytes[from, from+len) — simple multiplicative chain + mix. */
  @inline def hashBytes(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix(h)
  }
}

/** MinHash signature over k-char shingles: array<long> of numPerms
  * affine min-hashes, one pass over the text.
  */
case class MinHashSig(child: Expression, numPerms: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.signature(input.asInstanceOf[UTF8String], numPerms, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSig.signature($c, $numPerms, $k))")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import SigHash._

  def signature(text: UTF8String, numPerms: Int, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val last = math.max(n - k, 0)
    var pos = 0
    while (pos <= last) {
      val len = math.min(k, n - pos)
      if (len > 0) {
        val h = java.lang.Math.floorMod(hashBytes(bytes, pos, len), P)
        var i = 0
        while (i < numPerms) {
          val v = java.lang.Math.floorMod((2L * i + 1) * h + 7919L * (i + 1), P)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      pos += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L)
    mins
  }
}

/** 64-bit SimHash over whitespace tokens, one pass: each token's hash
  * votes ±1 on every bit, weighted by occurrence.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import SigHash._

  def simhash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val isSpace = i == n || bytes(i) == ' ' || bytes(i) == '\n' ||
        bytes(i) == '\t' || bytes(i) == '\r'
      if (isSpace) {
        if (tokStart >= 0) {
          val h = hashBytes(bytes, tokStart, i - tokStart)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

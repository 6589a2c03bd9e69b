package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.bridge

/** Column-level entry points for the engine's native expressions. */
package object functions {

  /** rapidfuzz `fuzz.ratio`-compatible Indel similarity (0..100). */
  def indel_ratio(a: Column, b: Column): Column =
    bridge.column(IndelRatio(bridge.expression(a), bridge.expression(b)))

  /** Single-pass MinHash signature (array<long>, numPerms entries). */
  def minhash_sig(text: Column, numPerms: Int = 32, k: Int = 5): Column =
    bridge.column(MinHashSig(bridge.expression(text), numPerms, k))

  /** Single-pass 64-bit SimHash over whitespace tokens. */
  def simhash64(text: Column): Column =
    bridge.column(SimHash64(bridge.expression(text)))

  /** Allocation-free codegen cosine similarity of two float vectors. */
  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))

  /** Merge-scan |A ∩ B| over two sorted long arrays (allocation-free). */
  def sorted_intersect_count(a: Column, b: Column): Column =
    bridge.column(SortedIntersectCount(bridge.expression(a), bridge.expression(b)))

  /** Bounded top-k aggregate: array<struct<score,id>> of the k best
    * (score desc, id asc) pairs, with map-side partial bounding.
    */
  def bounded_topk(score: Column, id: Column, k: Int): Column =
    bridge.column(
      BoundedTopK(bridge.expression(score), bridge.expression(id), k)
        .toAggregateExpression())
}

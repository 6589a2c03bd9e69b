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

  /** Allocation-free codegen exact squared L2 of two long vectors. */
  def sq_dist_long(a: Column, b: Column): Column =
    bridge.column(SqDistLong(bridge.expression(a), bridge.expression(b)))

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

  /** KMV distinct-count sketch aggregate over long values: ascending
    * array of the k smallest DISTINCT inputs, map-side bounded to ≤ k.
    */
  def kmv_min(value: Column, k: Int): Column =
    bridge.column(KmvSketch(bridge.expression(value), k).toAggregateExpression())

  /** Union-merge of KMV sketches (arrays from [[kmv_min]] or singleton
    * inits): the k smallest distinct values across all input arrays.
    */
  def kmv_merge(sketch: Column, k: Int): Column =
    bridge.column(KmvMerge(bridge.expression(sketch), k).toAggregateExpression())

  /** Bijective 64-bit avalanche hash (distinct-count preserving). */
  def mix64(x: Column): Column =
    bridge.column(Mix64(bridge.expression(x)))

  /** Misra–Gries frequent-item candidates (ascending array<string>):
    * a guaranteed superset of the items with frequency > N/(capacity+1),
    * map-side bounded to ≤ capacity entries per partition buffer.
    */
  def mg_candidates(item: Column, capacity: Int): Column =
    bridge.column(
      MgCandidates(bridge.expression(item), capacity).toAggregateExpression())
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{ConnectedComponents, Triangles}

/** The additive-snapshot maintenance family: star-contracted
  * incremental connected components and delta-proportional triangle
  * counting. Both are defined by equivalence to the fresh recompute
  * over the union graph, so every test asserts exactly that.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  // ─────────────── incremental connected components ───────────────

  test("incremental CC: merge, fresh-vertex, and singleton-attach deltas ≡ fresh run") {
    val old = edges((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
    val oldVerts = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 50L).toDF("id")
    val prev = ConnectedComponents.run(spark, old, Some(oldVerts), numPartitions = 4)
    // sanity: 50 is an isolated singleton in the prior labeling
    assert(prev.filter(col("id") === 50L).first().getLong(1) == 50L)

    // delta merges {1,2,3} with {10,11}, spawns a brand-new component
    // {30,31}, and attaches the old singleton 50 to a new vertex 60
    val delta = edges((3L, 10L), (30L, 31L), (60L, 50L))
    val inc = ConnectedComponents.incremental(spark, prev, delta, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val allVerts = oldVerts.unionAll(Seq(30L, 31L, 60L).toDF("id")).distinct()
    val fresh = ConnectedComponents.run(spark, old.unionAll(delta),
        Some(allVerts), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(inc == fresh)
    assert(inc(11L) == 1L)   // merged component takes the global min id
    assert(inc(31L) == 30L)  // fresh component labels by its own min
    assert(inc(60L) == 50L)  // old singleton's id is the pair min
    assert(inc(21L) == 20L)  // untouched component label unchanged
  }

  test("incremental CC: chain of deltas across two rounds stays equal to fresh") {
    val old = edges((1L, 2L), (5L, 6L), (8L, 9L))
    val prev1 = ConnectedComponents.run(spark, old, None, numPartitions = 4)
    val d1 = edges((2L, 5L))
    val prev2 = ConnectedComponents.incremental(spark, prev1, d1, numPartitions = 4)
    val d2 = edges((6L, 8L))
    val inc = ConnectedComponents.incremental(spark, prev2, d2, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fresh = ConnectedComponents.run(spark,
        old.unionAll(d1).unionAll(d2), None, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == fresh)
    assert(inc.values.toSet == Set(1L)) // everything merged to min id 1
  }

  // ─────────────── incremental triangle delta ───────────────

  test("triangle delta: 1-, 2-, and 3-delta-edge triangles each count once") {
    // old: path 1-2-3, path 4-5, wedge 7-8-9, pair 10-11 (0 triangles)
    val old = edges((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L), (8L, 9L), (10L, 11L))
    // delta closes: {1,2,3} via one new edge, {4,5,6} via two new
    // edges, {12,13,14} entirely new (three delta edges), and {7,8,9}
    // via one new edge; pair 10-11 stays triangle-free
    val delta = edges((1L, 3L), (4L, 6L), (5L, 6L), (12L, 13L), (13L, 14L),
      (12L, 14L), (7L, 9L))
    val d = Triangles.incrementalDelta(spark, old, delta, numPartitions = 4)
    assert(d == 4L)
    val fresh = Triangles.countTriangles(spark, old.unionAll(delta), numPartitions = 4)
    val before = Triangles.countTriangles(spark, old, numPartitions = 4)
    assert(before == 0L && d == fresh - before)
  }

  test("triangle delta: shared-edge and hub overlaps don't double count") {
    // K4 on {1,2,3,4} built as old C4 (1-2-3-4-1) plus delta diagonals
    // (1,3),(2,4): 4 new triangles, each containing 1-2 delta edges,
    // and the two diagonals share no triangle (they cross)
    val old = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val delta = edges((1L, 3L), (2L, 4L))
    val d = Triangles.incrementalDelta(spark, old, delta, numPartitions = 4)
    val fresh = Triangles.countTriangles(spark, old.unionAll(delta), numPartitions = 4)
    assert(d == 4L && fresh == 4L)

    // hub 100 adjacent to 6 spokes (old); delta rings consecutive
    // spokes: each delta edge closes exactly one triangle through the
    // hub, every triangle found from its lower-degree (spoke) side
    val spokes = (1L to 6L).map(i => (100L, i + 200L))
    val ring = (1L until 6L).map(i => (i + 200L, i + 201L))
    val d2 = Triangles.incrementalDelta(spark,
      edges(spokes: _*), edges(ring: _*), numPartitions = 4)
    assert(d2 == 5L)
  }
}

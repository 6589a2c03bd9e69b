package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Matching

/** Maximal-matching invariants: vertex-disjointness, maximality,
  * vertex-cover coverage, and partitioning determinism on the
  * arithmetic fixture.
  */
class MatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def fixtureEdges(n: Long) = {
    val r = spark.range(n).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(10L)) =!= 0)
    def rule(m: Long, c: Long) =
      r.select(col("a").as("src"),
        pmod(col("a") + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(n)).as("dst"))
    rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
      .filter(col("src") =!= col("dst")).distinct()
  }

  test("matching is vertex-disjoint and maximal on the fixture") {
    val edges = fixtureEdges(500L)
    val m = Matching.run(spark, edges, numPartitions = 4).cache()
    val rows = m.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val touched = rows.flatMap(e => Seq(e._1, e._2))
    assert(touched.distinct.length == touched.length,
      "two matched edges share a vertex")
    info(s"matching size=${rows.length} rounds=${rows.map(_._3).max}")

    // maximality: every input edge touches a matched vertex
    val matchedV = m.select(col("u").as("id"))
      .unionAll(m.select(col("v").as("id"))).distinct()
    val untouched = edges
      .join(matchedV.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(matchedV.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .count()
    assert(untouched == 0, s"$untouched edges with no matched endpoint")
    m.unpersist()
  }

  test("vertex cover covers every edge and is exactly 2x the matching") {
    val edges = fixtureEdges(300L)
    val cover = Matching.vertexCover(spark, edges, numPartitions = 4).cache()
    val uncovered = edges
      .join(cover.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(cover.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .count()
    assert(uncovered == 0)
    val mSize = Matching.run(spark, edges, numPartitions = 4).count()
    assert(cover.count() == 2 * mSize)
    cover.unpersist()
  }

  test("matching is deterministic across partition counts") {
    val edges = fixtureEdges(300L)
    def m(p: Int) = Matching.run(spark, edges, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e._1, e._2)).toSeq
    assert(m(2) == m(5))
  }

  // ── weighted (locally-heaviest) variant ──

  def weightedFixture(n: Long) = fixtureEdges(n)
    .withColumn("weight", lit(1L) + pmod(col("src") + col("dst"), lit(7L)))

  test("weighted matching: disjoint, maximal, and picks the heavy edge") {
    import spark.implicits._
    // path 1-2-3-4 with weights 2,3,2: the locally-heaviest edge (2,3)
    // must match alone (its neighbors retire), exactly — deterministic
    val path = Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 2L))
      .toDF("src", "dst", "weight")
    val m = Matching.runWeighted(spark, path, numPartitions = 2)
    assert(m.select("u", "v", "w").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 3L, 3L)))

    val edges = weightedFixture(500L)
    val mm = Matching.runWeighted(spark, edges, numPartitions = 4).cache()
    val touched = mm.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(touched.distinct.length == touched.length,
      "two matched edges share a vertex")
    val matchedV = mm.select(col("u").as("id"))
      .unionAll(mm.select(col("v").as("id"))).distinct()
    val untouched = edges
      .join(matchedV.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(matchedV.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .count()
    assert(untouched == 0, s"$untouched edges with no matched endpoint")
    mm.unpersist()
  }

  test("weighted matching achieves >= 1/2 the optimum on a small graph") {
    import spark.implicits._
    // 8-vertex random-ish weighted graph, small enough to brute-force
    val es = Seq((0L, 1L, 9L), (1L, 2L, 8L), (2L, 3L, 7L), (3L, 4L, 9L),
      (4L, 5L, 3L), (5L, 6L, 8L), (6L, 7L, 5L), (7L, 0L, 4L),
      (0L, 4L, 6L), (1L, 5L, 2L), (2L, 6L, 9L), (3L, 7L, 1L))
    val got = Matching.runWeighted(spark,
      es.toDF("src", "dst", "weight"), numPartitions = 2)
      .agg(sum(col("w"))).head().getLong(0)
    // exact max-weight matching by exhaustive search
    def best(rem: List[(Long, Long, Long)], used: Set[Long]): Long = rem match {
      case Nil => 0L
      case (u, v, w) :: t =>
        val skip = best(t, used)
        if (used(u) || used(v)) skip
        else math.max(skip, w + best(t, used + u + v))
    }
    val opt = best(es.toList, Set.empty)
    assert(2 * got >= opt, s"matched weight $got < half of optimum $opt")
    info(s"matched weight $got vs optimum $opt")
  }

  test("weighted matching with constant weights equals the unweighted peel") {
    val edges = fixtureEdges(300L)
    val unw = Matching.run(spark, edges, numPartitions = 4)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    val w = Matching.runWeighted(spark,
      edges.withColumn("weight", lit(5L)), numPartitions = 4)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(w == unw, "constant-weight peel diverged from the unweighted one")
  }

  test("weighted matching is deterministic across partition counts") {
    val edges = weightedFixture(300L)
    def m(p: Int) = Matching.runWeighted(spark, edges, numPartitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(m(2) == m(5))
  }

  // ── matching-contraction coarsening ──

  test("coarsen: valid mapping, weight conservation, matched shrink") {
    val edges = weightedFixture(400L).cache()
    val nV = edges.select(col("src").as("id"))
      .unionAll(edges.select(col("dst").as("id"))).distinct().count()
    val mSize = Matching.runWeighted(spark, edges, numPartitions = 4).count()
    val totalW = edges.agg(sum(col("weight"))).head().getLong(0)

    val (mapping, coarse) = Matching.coarsen(spark, edges, numPartitions = 4)
    val mapped = mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every endpoint mapped; coarse ids are fixed points of the mapping
    assert(mapped.size == nV)
    assert(mapped.values.forall(c => mapped(c) == c),
      "coarse ids must map to themselves")
    // matched pairs fuse: exactly |M| vertices disappear
    assert(mapped.values.toSet.size == nV - mSize)

    val coarseRows = coarse.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(coarseRows.forall { case (s, d, _) => s < d },
      "coarse edges must be canonical src<dst")
    // weight conservation: coarse total + contracted intra-pair total
    // = fine total (recompute the drop directly from the mapping)
    val dropped = edges.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (s, d, _) => mapped(s) == mapped(d) }
      .map(_._3).sum
    assert(coarseRows.map(_._3).sum + dropped == totalW)
    // a second level keeps shrinking (the multilevel hierarchy)
    val (_, coarse2) = Matching.coarsen(spark, coarse, numPartitions = 4)
    val nV2 = coarseRows.flatMap(e => Seq(e._1, e._2)).distinct.length
    val nV3 = coarse2.collect().flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .distinct.length
    assert(nV3 < nV2, "second coarsening level must shrink the graph")
    edges.unpersist()
  }
}

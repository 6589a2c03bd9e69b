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
}

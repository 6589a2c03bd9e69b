package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Robustness

/** Random-failure (bond percolation) and targeted-attack robustness
  * curves.
  */
class RobustnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  // two disjoint triangles
  private def twoTriangles = edges((1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L))

  test("percolation at keep-all and keep-none brackets the curve") {
    val rows = Robustness.bondPercolation(spark, twoTriangles,
        Seq((1L, 1L), (0L, 1L)), salt = 3L, numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // everything survives: the two triangles as-is
    assert(rows((1L, 1L)) == (6L, 2L, 3L))
    // nothing survives: six singleton components, giant = 1
    assert(rows((0L, 1L)) == (0L, 6L, 1L))
  }

  test("percolation is deterministic and tracks the keep rate") {
    val ring = edges((0L until 400L).map(i => (i, (i + 1) % 400)): _*)
    val a = Robustness.bondPercolation(spark, ring, Seq((1L, 2L)),
      salt = 9L, numPartitions = 4).collect()(0)
    val b = Robustness.bondPercolation(spark, ring, Seq((1L, 2L)),
      salt = 9L, numPartitions = 2).collect()(0)
    assert(a.getLong(2) == b.getLong(2) && a.getLong(4) == b.getLong(4))
    // kept fraction within a loose band of 1/2
    assert(a.getLong(2) > 140 && a.getLong(2) < 260)
    // a different salt percolates a different subset
    val c = Robustness.bondPercolation(spark, ring, Seq((1L, 2L)),
      salt = 10L, numPartitions = 4).collect()(0)
    assert(c.getLong(2) != a.getLong(2) || c.getLong(4) != a.getLong(4))
  }

  // star 10–{11..15} plus a triangle {1,2,3}
  private def starPlusTriangle = edges((10L, 11L), (10L, 12L), (10L, 13L),
    (10L, 14L), (10L, 15L), (1L, 2L), (1L, 3L), (2L, 3L))

  test("attack: cutting the hub shatters the star, spares the triangle") {
    val rows = Robustness.degreeAttack(spark, starPlusTriangle,
        Seq(6L, 5L, 2L), numPartitions = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // cutoff 6: nobody has degree >= 6 — intact: star(6) + triangle(3)
    assert(rows(6L) == (0L, 8L, 2L, 6L))
    // cutoff 5: the hub goes; 5 leaf singletons + the triangle survive
    assert(rows(5L) == (1L, 3L, 6L, 3L))
    // cutoff 2: hub and triangle go; only the five leaves remain
    assert(rows(2L) == (4L, 0L, 5L, 1L))
  }

  test("site percolation: keep-all/keep-none brackets, survivors counted") {
    val rows = Robustness.sitePercolation(spark, twoTriangles,
        Seq((1L, 1L), (0L, 1L)), salt = 5L, numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows((1L, 1L)) == (6L, 6L, 2L, 3L))
    // all vertices gone: empty row, no phantom singletons
    assert(rows((0L, 1L)) == (0L, 0L, 0L, 0L))
  }

  test("site percolation: partition-invariant and exactly the replayed predicate") {
    import graft.graph.GraphOps
    val ringPairs = (0L until 400L).map(i => (i, (i + 1) % 400))
    val ring = edges(ringPairs: _*)
    val a = Robustness.sitePercolation(spark, ring, Seq((1L, 2L)),
      salt = 9L, numPartitions = 4).collect()(0)
    val b = Robustness.sitePercolation(spark, ring, Seq((1L, 2L)),
      salt = 9L, numPartitions = 2).collect()(0)
    assert(a.getLong(2) == b.getLong(2) && a.getLong(3) == b.getLong(3) &&
      a.getLong(5) == b.getLong(5))
    // replay the predicate driver-side: survivors and induced edges exact
    val kept = spark.range(400)
      .filter(GraphOps.sampleKeep(col("id"), 1, 2, 9L))
      .collect().map(_.longValue).toSet
    assert(a.getLong(2) == kept.size.toLong)
    assert(a.getLong(3) ==
      ringPairs.count(p => kept(p._1) && kept(p._2)).toLong)
  }

  test("attack: removing every vertex yields the empty row") {
    val r = Robustness.degreeAttack(spark, edges((1L, 2L)), Seq(1L),
      numPartitions = 2).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (2L, 0L, 0L, 0L))
  }
}

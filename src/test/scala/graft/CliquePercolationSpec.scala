package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.CliquePercolation

/** k=3 clique percolation: overlapping communities from
  * edge-sharing triangles.
  */
class CliquePercolationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def run(edges: Seq[(Long, Long)], parts: Int = 4): Set[(Long, Long, Long)] =
    CliquePercolation.run(spark, edges.toDF("src", "dst"), parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("two triangles sharing an edge form ONE community") {
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    // min member edge of the merged community is (1,2)
    assert(got == Set(1L, 2L, 3L, 4L).map(id => (id, 1L, 2L)))
  }

  test("two triangles sharing only a vertex stay separate; the hinge overlaps") {
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L)))
    val byId = got.groupBy(_._1)
    assert(byId(3L).size == 2, s"hinge must be in both: ${byId(3L)}")
    assert(byId(1L) == Set((1L, 1L, 2L)))
    assert(byId(5L) == Set((5L, 3L, 4L)))
  }

  test("triangle-free graph has no communities") {
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).isEmpty)
  }

  test("K4 is one community containing all four vertices") {
    val es = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = run(es)
    assert(got == Set(1L, 2L, 3L, 4L).map(id => (id, 1L, 2L)))
  }

  test("a triangle strip percolates into one community") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L))
    val got = run(es)
    assert(got.map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(got.forall(t => (t._2, t._3) == (1L, 2L)))
  }

  test("partitioning-invariant and orientation-free") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L))
    val a = run(es, parts = 2)
    val b = run(es.map { case (s, d) => (d, s) }, parts = 8)
    assert(a == b)
  }
}

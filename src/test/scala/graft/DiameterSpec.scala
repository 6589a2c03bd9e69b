package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.algo.ShortestPaths
import graft.graph.GraphOps

/** Double-sweep diameter bounds: hand geometries + the
  * lower ≤ diameter ≤ upper sandwich against all-pairs BFS.
  */
class DiameterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bounds(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val df = edges.toDF("src", "dst")
    val r = ShortestPaths.diameterBounds(spark, GraphOps.symmetrize(df),
      numPartitions = 4).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("path P4: double sweep is exact") {
    // 0-1-2-3: seed 0, farthest = 3 at dist 3; ecc(3) = 3
    assert(bounds(Seq((0L, 1L), (1L, 2L), (2L, 3L))) === ((0L, 3L, 3L, 3L, 6L)))
  }

  test("cycle C5: ties to min id, bounds sandwich the true diameter 2") {
    val (s, u, ecc, lo, hi) = bounds((0L until 5L).map(i => (i, (i + 1) % 5)))
    assert(s === 0L && u === 2L) // dist-2 tie between 2 and 3 -> 2
    assert(lo === 2L && hi === 4L)
  }

  test("star from the center: second sweep recovers the leaf-to-leaf 2") {
    val (s, u, ecc, lo, hi) = bounds((1L to 6L).map(i => (0L, i)))
    assert(s === 0L && u === 1L && lo === 2L && hi === 4L)
  }

  test("sandwich property on a connected ring+chords graph") {
    val v = 60L
    val edges = ((0L until v).map(a => (a, (a + 1) % v)) ++
      (0L until v).filter(_ % 10 != 0).flatMap { a =>
        Seq((a, (a + 4 * (a % 7 + 1)) % v), (a, (a + 4 * (a % 11 + 3)) % v))
      }).filter(e => e._1 != e._2).distinct
    val (_, _, _, lo, hi) = bounds(edges)
    // exact diameter by all-pairs BFS over every vertex as landmark
    val sym = GraphOps.symmetrize(edges.toDF("src", "dst"))
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val all = ShortestPaths.run(spark, sym, ids, numPartitions = 4)
    val diam = all.agg(org.apache.spark.sql.functions.max("dist"))
      .head().getLong(0)
    assert(lo <= diam && diam <= hi)
    assert(lo === diam, "double sweep is exact on this fixture")
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Densest
import graft.graph.GraphOps

/** Densest-subgraph peel: exact extraction of a planted clique, and
  * the 2(1+ε) approximation guarantee checked against a brute-force
  * all-subsets maximum on a small graph (exact rational comparisons
  * end-to-end).
  */
class DensestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("K5 + path: one peel isolates the clique, density exact") {
    // m=16, n=11: round-0 threshold 2.5·16/11 ≈ 3.64 peels the path
    // (deg ≤ 2) and keeps the K5 (deg 4, 5); round 1 scores 10/5 = 2
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val g = GraphOps.symmetrize(
      (k5 ++ Seq((5L, 10L), (10L, 11L), (11L, 12L), (12L, 13L),
        (13L, 14L), (14L, 15L))).toDF("src", "dst"))
    val r = Densest.run(spark, g, numPartitions = 4)
    assert(r.round == 1 && r.edges == 10L && r.vertices == 5L)
    assert(r.members.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("approximation bound: density >= brute-force max / 2(1+eps)") {
    // 12-vertex arithmetic graph: brute-force all 4095 subsets
    val n = 12
    val edges = (for {
      i <- 0 until n; j <- (i + 1) until n
      if (i * 5 + j * 3 + (i * j) % 7) % 3 == 0
    } yield (i.toLong, j.toLong)).toSeq
    val g = GraphOps.symmetrize(edges.toDF("src", "dst"))
    val r = Densest.run(spark, g, numPartitions = 4)

    var bestM = 0L; var bestN = 1L
    for (mask <- 1 until (1 << n)) {
      val in = (0 until n).filter(i => (mask & (1 << i)) != 0).toSet
      val m = edges.count { case (a, b) => in(a.toInt) && in(b.toInt) }.toLong
      if (m * bestN > bestM * in.size) { bestM = m; bestN = in.size.toLong }
    }
    // guarantee: r.density >= max / (2*(1+eps)) = max * 2 / 5
    assert(BigInt(r.edges) * 5 * bestN >= BigInt(bestM) * 2 * r.vertices,
      s"got ${r.edges}/${r.vertices}, brute max $bestM/$bestN")
    // and the returned (m, n) must describe a real induced subgraph
    val mem = r.members.collect().map(_.getLong(0)).toSet
    val mReal = edges.count { case (a, b) => mem(a) && mem(b) }
    assert(mem.size.toLong == r.vertices && mReal.toLong == r.edges)
  }
}

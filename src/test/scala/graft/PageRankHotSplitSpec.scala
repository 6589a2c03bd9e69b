package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.PageRank

/** Focused coverage for the r6 PageRank setup rewrite on the HOT-SPLIT
  * path, which no fixture graph reaches (the hub threshold is
  * max(edgeCount/numPartitions, 10000) and fixture graphs are far
  * smaller). The graph here is built so the split PROVABLY fires:
  * edgeCount = 20010, numPartitions = 2 → threshold = max(10005,
  * 10000) = 10005, and the hub's out-degree is 20000 ≥ 10005 — so the
  * hub edges go through the broadcast route (eHot) and the 10 back
  * edges through the co-partitioned cold route. Expected ranks come
  * from an independent driver-side power iteration of the exact same
  * recurrence (damping 0.85, dangling redistribution, max|Δ| < tol).
  */
class PageRankHotSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hot-split ranks match an independent power iteration") {
    val n = 20001            // vertices 0..20000
    val hubFan = 20000
    val backs = 10
    val edges =
      (1 to hubFan).map(i => (0L, i.toLong)) ++        // hub → leaves (hot)
        (1 to backs).map(i => (i.toLong, 0L))          // few back edges (cold)
    val eDf = edges.toDF("src", "dst")

    val res = PageRank.run(spark, eDf, numPartitions = 2)
    assert(res.edgeCount === hubFan + backs)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === n)

    // independent mirror of the recurrence on the driver
    val d = 0.85
    val tol = 1e-6
    val outDeg = Array.fill(n)(0)
    edges.foreach { case (s, _) => outDeg(s.toInt) += 1 }
    var rank = Array.fill(n)(1.0 / n)
    var prev = rank
    var converged = false
    var it = 0
    while (it < 100 && !converged) {
      val dangling = (0 until n).collect { case v if outDeg(v) == 0 => rank(v) }.sum
      val contrib = Array.fill(n)(0.0)
      edges.foreach { case (s, t) =>
        contrib(t.toInt) += rank(s.toInt) / outDeg(s.toInt)
      }
      prev = rank
      rank = Array.tabulate(n)(v =>
        (1.0 - d) / n + d * (contrib(v) + dangling / n))
      it += 1
      converged = (0 until n).map(v => math.abs(rank(v) - prev(v))).max < tol
    }

    assert(res.iterations === it, "superstep count must match the mirror")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks must stay a distribution")
    (0 until n).foreach { v =>
      assert(math.abs(got(v.toLong) - rank(v)) < 1e-9,
        s"rank mismatch at vertex $v")
    }
  }
}

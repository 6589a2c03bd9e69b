package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.algo.InfluenceMax
import graft.graph.GraphOps

/** DegreeDiscountIC vs a sequential reference with the identical
  * integer scoring, plus hand examples.
  */
class InfluenceMaxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refDegreeDiscount(edges: Seq[(Long, Long)], k: Int,
                                pNum: Long = 1L, pDen: Long = 10L)
      : Seq[(Long, Long, Long)] = {
    val sym = (edges ++ edges.map(e => (e._2, e._1))).distinct
    val nbrs = sym.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val deg = nbrs.map { case (v, ns) => v -> ns.size.toLong }
    val tv = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val picked = scala.collection.mutable.Set[Long]()
    val out = Seq.newBuilder[(Long, Long, Long)]
    for (r <- 0 until k) {
      def score(v: Long) =
        pDen * deg(v) - 2L * pDen * tv(v) - (deg(v) - tv(v)) * tv(v) * pNum
      val cands = deg.keys.filterNot(picked.contains)
      val pick = cands.minBy(v => (-score(v), v))
      out += ((r.toLong, pick, score(pick)))
      picked += pick
      nbrs(pick).foreach(u => tv(u) += 1L)
    }
    out.result()
  }

  private val arithEdges: Seq[(Long, Long)] = {
    val v = 80L
    (0L until v).filter(_ % 10 != 0).flatMap { a =>
      Seq((a, (a + 4 * (a % 7 + 1)) % v), (a, (a + 4 * (a % 11 + 3)) % v))
    }.filter(e => e._1 != e._2).distinct
  }

  test("distributed == sequential reference, k=5") {
    val e = arithEdges.toDF("src", "dst")
    val got = InfluenceMax.degreeDiscount(spark,
      GraphOps.symmetrize(e), k = 5, numPartitions = 4)
      .seeds.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === refDegreeDiscount(arithEdges, 5))
  }

  test("two stars: second pick avoids the discounted rim") {
    // star A: center 0 with leaves 1..6; star B: center 10 with
    // leaves 11..14; bridge 1-11. Pick 1 = center 0 (deg 6). The
    // discount hits 0's leaves (deg-1 vertices), so pick 2 = center 10
    // (deg 4, undiscounted beats any discounted candidate).
    val e = ((1L to 6L).map((0L, _)) ++ (11L to 14L).map((10L, _)) ++
      Seq((1L, 11L))).toDF("src", "dst")
    val got = InfluenceMax.degreeDiscount(spark,
      GraphOps.symmetrize(e), k = 2, numPartitions = 2)
      .seeds.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(0L, 10L))
    assert(got(0)._3 === 60L)  // 10·6, undiscounted
    assert(got(1)._3 === 40L)  // 10·4, untouched by star A's discount
  }

  test("discount formula: t=1 neighbor of a pick scores den·d − 2·den − (d−1)·num") {
    // path 0-1-2: deg(1)=2, deg(0)=deg(2)=1. Pick 1 = vertex 1 (deg 2).
    // Then 0 and 2 have t=1: S = 10·1 − 20 − 0·1 = −10; both picked
    // AFTER any undiscounted vertex would be — here none remain, so
    // pick 2 = vertex 0 (tie −10 with vertex 2 → min id).
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = InfluenceMax.degreeDiscount(spark,
      GraphOps.symmetrize(e), k = 3, numPartitions = 2)
      .seeds.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(1L, 0L, 2L))
    assert(got(1)._3 === -10L && got(2)._3 === -10L)
  }
}

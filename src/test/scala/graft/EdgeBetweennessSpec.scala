package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Betweenness, ShortestPaths}
import graft.graph.GraphOps

/** Brandes' edge-betweenness variant: per-edge shortest-path flow,
  * the Girvan–Newman splitting signal.
  */
class EdgeBetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sym(pairs: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(pairs.toDF("src", "dst"))

  def scores(df: DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("path P4, all sources: hand-computed 6 / 8 / 6") {
    val eb = scores(Betweenness.edgeScores(spark,
      sym((1L, 2L), (2L, 3L), (3L, 4L)), sources = Seq(1L, 2L, 3L, 4L),
      numPartitions = 4))
    assert(eb == Map((1L, 2L) -> 6.0, (2L, 3L) -> 8.0, (3L, 4L) -> 6.0))
  }

  test("cycle C4, all sources: σ-split gives every edge 4.0") {
    val eb = scores(Betweenness.edgeScores(spark,
      sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      sources = Seq(1L, 2L, 3L, 4L), numPartitions = 4))
    assert(eb.size == 4)
    assert(eb.values.forall(v => math.abs(v - 4.0) < 1e-12))
  }

  test("total edge flow = sum of pairwise distances; the bridge carries the most") {
    // barbell: two triangles joined by a bridge — the classic
    // Girvan-Newman fixture, the bridge must dominate
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val all = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val eb = scores(Betweenness.edgeScores(spark, g, all, numPartitions = 4))

    val distSum = ShortestPaths.run(spark, g, all, numPartitions = 4)
      .agg(sum(col("dist"))).first().getLong(0)
    assert(math.abs(eb.values.sum - distSum) < 1e-9)
    assert(eb.maxBy(_._2)._1 == ((3L, 4L))) // the bridge
    assert(math.abs(eb((3L, 4L)) - 18.0) < 1e-9) // 9 ordered cross pairs × 2
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Pic
import graft.graph.GraphOps

/** Power iteration clustering: early-stopped affinity-walk embedding
  * + largest-gap split.
  */
class PicSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sym(rows: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(rows.toDF("src", "dst"))

  def clusters(df: DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

  def partitionOf(c: Map[Long, Int]): Set[Set[Long]] =
    c.groupBy(_._2).values.map(_.keySet.toSet).toSet

  test("two cliques joined by one edge split at k=2") {
    val k5a = for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)
    val k5b = for (a <- 11L to 15L; b <- a + 1 to 15L) yield (a, b)
    val es = k5a ++ k5b ++ Seq((5L, 11L))
    val got = partitionOf(clusters(Pic.run(spark, sym(es: _*), k = 2,
      iters = 5, numPartitions = 4)))
    assert(got == Set((1L to 5L).toSet, (11L to 15L).toSet))
  }

  test("three blobs at k=3") {
    def blob(lo: Long): Seq[(Long, Long)] =
      for (a <- lo until lo + 4; b <- a + 1 until lo + 4) yield (a, b)
    val es = blob(1) ++ blob(21) ++ blob(41) ++ Seq((4L, 21L), (24L, 41L))
    val c = clusters(Pic.run(spark, sym(es: _*), k = 3,
      iters = 5, numPartitions = 4))
    def oneCluster(r: Seq[Long]) = r.map(c).distinct.size == 1
    assert(oneCluster(1L to 4L) && oneCluster(21L to 24L) && oneCluster(41L to 44L),
      s"blobs must stay whole: $c")
    assert(Set(c(1L), c(21L), c(41L)).size == 3, s"blobs must separate: $c")
  }

  test("partitioning-invariant: same clusters at 2 and 8 partitions") {
    val k4a = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val k4b = for (a <- 11L to 14L; b <- a + 1 to 14L) yield (a, b)
    val es = k4a ++ k4b ++ Seq((4L, 11L))
    val c2 = clusters(Pic.run(spark, sym(es: _*), k = 2, iters = 5, numPartitions = 2))
    val c8 = clusters(Pic.run(spark, sym(es: _*), k = 2, iters = 5, numPartitions = 8))
    assert(c2 == c8)
  }

  test("cluster ids ascend with the embedding") {
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 10L))
    val rows = Pic.run(spark, sym(es: _*), k = 2, iters = 4, numPartitions = 4)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    val maxC0 = rows.filter(_._2 == 0).map(_._1).max
    val minC1 = rows.filter(_._2 == 1).map(_._1).min
    assert(maxC0 < minC1)
  }
}

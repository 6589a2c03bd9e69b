package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Wl
import graft.graph.GraphOps

/** 1-WL color refinement: structural fingerprints via commutative
  * modular multiset hashing.
  */
class WlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def sym(rows: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(rows.toDF("src", "dst"))

  def colors(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

  test("path P4: ends share a color, middles share a color, ends != middles") {
    val c = colors(Wl.refine(spark, sym((1L, 2L), (2L, 3L), (3L, 4L)),
      rounds = 3, numPartitions = 4))
    assert(c(1L) == c(4L) && c(2L) == c(3L))
    assert(c(1L) != c(2L))
  }

  test("isomorphic components get identical color multisets") {
    // two disjoint copies of the same 5-vertex shape (star + tail)
    def copy(o: Long) = Seq((o, o + 1), (o, o + 2), (o, o + 3), (o + 3, o + 4))
    val c = colors(Wl.refine(spark, sym(copy(0) ++ copy(100): _*),
      rounds = 4, numPartitions = 4))
    (0L to 4L).foreach(i => assert(c(i) == c(i + 100), s"vertex $i"))
  }

  test("star vs path with equal vertex counts: different color multisets") {
    val star = sym((1L, 2L), (1L, 3L), (1L, 4L))
    val path = sym((11L, 12L), (12L, 13L), (13L, 14L))
    val cs = colors(Wl.refine(spark, star, rounds = 3, numPartitions = 2))
      .values.toSeq.sorted
    val cp = colors(Wl.refine(spark, path, rounds = 3, numPartitions = 2))
      .values.toSeq.sorted
    assert(cs != cp)
  }

  test("each round refines: equal colors at r+1 imply equal at r") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L), (5L, 6L))
    val g = sym(es: _*)
    val c1 = colors(Wl.refine(spark, g, rounds = 1, numPartitions = 4))
    val c2 = colors(Wl.refine(spark, g, rounds = 2, numPartitions = 4))
    for (a <- c2.keys; b <- c2.keys if c2(a) == c2(b))
      assert(c1(a) == c1(b), s"$a,$b equal at 2 but split at 1")
    // and the refinement is strict here: round 2 splits the degree-2 shell
    assert(c2.values.toSet.size > c1.values.toSet.size)
  }

  test("partitioning-invariant: identical colors at 2 and 8 partitions") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 4L), (2L, 7L))
    val a = colors(Wl.refine(spark, sym(es: _*), rounds = 4, numPartitions = 2))
    val b = colors(Wl.refine(spark, sym(es: _*), rounds = 4, numPartitions = 8))
    assert(a == b)
  }

  test("quotient: P3 folds to one cross-class super-edge of weight 2") {
    val g = sym((1L, 2L), (2L, 3L))
    val cdf = Wl.refine(spark, g, rounds = 3, numPartitions = 2)
    val q = Wl.quotient(cdf, Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(q.length == 1 && q.head._3 == 2L)
    assert(q.head._1 != q.head._2) // ends vs middle
  }

  test("quotient: K3 folds to a single same-class loop of weight 3") {
    val es = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val cdf = Wl.refine(spark, sym(es: _*), rounds = 3, numPartitions = 2)
    val q = Wl.quotient(cdf, es.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(q.length == 1 && q.head._1 == q.head._2 && q.head._3 == 3L)
  }

  test("colorClasses: sizes sum to |V|, reps are class minima") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
    val cdf = Wl.refine(spark, sym(es: _*), rounds = 3, numPartitions = 4)
    val cls = Wl.colorClasses(cdf).collect()
    assert(cls.map(_.getLong(1)).sum == 5L)
    val byColor = colors(cdf).groupBy(_._2).map { case (k, v) => k -> v.keys.min }
    cls.foreach(r => assert(byColor(r.getLong(0)) == r.getLong(2)))
  }
}

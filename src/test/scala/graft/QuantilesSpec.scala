package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Quantiles

/** Exact order statistics via sketch-narrow-finish: equality with
  * direct sorted-array indexing on random data (heavy duplicates
  * included), through both the single-finish and the narrowing-loop
  * paths, plus the per-group variant.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def kth(sorted: IndexedSeq[Long], n: Long, num: Int, denom: Int): Long =
    sorted((math.max(1L, (n * num + denom - 1) / denom) - 1).toInt)

  test("exactQuantiles matches sorted-array indexing (duplicates included)") {
    import spark.implicits._
    val rnd = new Random(5)
    // heavy ties: values drawn from just 40 distinct longs
    val xs = IndexedSeq.fill(3000)(rnd.nextInt(40).toLong * 7 - 50)
    val sorted = xs.sorted
    val qs = Seq((1, 2), (1, 4), (9, 10), (99, 100), (1, 1), (1, 3000))
    val got = Quantiles.exactQuantiles(
        xs.toDF("v").repartition(9), "v", qs)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3))).toMap
    for ((num, denom) <- qs)
      assert(got((num, denom)) == kth(sorted, xs.size, num, denom),
        s"q=$num/$denom")
  }

  test("the narrowing loop (maxExact below n) returns the same answers") {
    import spark.implicits._
    val rnd = new Random(17)
    val xs = IndexedSeq.fill(5000)(rnd.nextLong() % 100000)
    val sorted = xs.sorted
    val qs = Seq((1, 2), (3, 4), (999, 1000))
    // maxExact=200 forces several re-sketch iterations at n=5000
    val got = Quantiles.exactQuantiles(
        xs.toDF("v").repartition(7), "v", qs, maxExact = 200L)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3))).toMap
    for ((num, denom) <- qs)
      assert(got((num, denom)) == kth(sorted, xs.size, num, denom),
        s"q=$num/$denom under narrowing")
  }

  test("groupQuantiles: exact per-group medians and ranks") {
    import spark.implicits._
    val rnd = new Random(29)
    val rows = for {
      g <- Seq("a", "b", "c")
      _ <- 1 to (100 + g.hashCode.abs % 57)
    } yield (g, rnd.nextInt(30).toLong)
    val got = Quantiles.groupQuantiles(
        rows.toDF("grp", "v").repartition(5), "grp", "v", 1, 2)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    for ((g, vs) <- rows.groupBy(_._1)) {
      val sorted = vs.map(_._2).sorted.toIndexedSeq
      val n = sorted.size.toLong
      val k = (n + 1) / 2
      assert(got(g) == ((n, k, sorted((k - 1).toInt))), s"group $g")
    }
  }
}

package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MgBuffer
import graft.text.HeavyHitters

/** Two-pass exact heavy hitters: the Misra–Gries candidate guarantee
  * under arbitrary partition splits and merge orders, and end-to-end
  * equality with the exact full-groupBy computation it replaces.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Skewed random stream: Zipf-ish head over a wide tail. */
  private def stream(rnd: Random, n: Int, headItems: Int,
                     tailItems: Int): Seq[String] =
    Seq.fill(n) {
      if (rnd.nextInt(100) < 60) s"h${rnd.nextInt(headItems)}"
      else s"t${rnd.nextInt(tailItems)}"
    }

  test("MgBuffer candidates contain every item above N/(capacity+1), " +
    "for random splits and merge orders") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val xs = stream(rnd, 4000, headItems = 8, tailItems = 2000)
      val cap = 16 + rnd.nextInt(48)
      // random partitioning into 1..12 chunks, pairwise-merged in a
      // random order (models partial agg + shuffled merge schedule)
      val parts = xs.grouped(1 + rnd.nextInt(400)).toSeq
      val bufs = parts.map { p =>
        val b = new MgBuffer(cap)
        p.foreach(b.insert)
        b
      }
      val merged = rnd.shuffle(bufs).reduce { (a, b) => a.merge(b); a }
      val truth = xs.groupBy(identity).view.mapValues(_.size)
      val mustHave = truth.filter(_._2 > xs.size / (cap + 1)).keySet
      val cands = merged.sortedItems.toSet
      assert(mustHave.subsetOf(cands),
        s"trial $trial cap=$cap missing ${mustHave -- cands}")
      assert(cands.size <= cap, s"summary exceeded capacity")
    }
  }

  test("frequentItems equals the exact groupBy-HAVING computation") {
    import spark.implicits._
    val rnd = new Random(11)
    val xs = stream(rnd, 20000, headItems = 6, tailItems = 5000)
    val df = xs.toDF("item").repartition(13) // partition-layout stress
    for (denom <- Seq(50, 200, 1000)) {
      val got = HeavyHitters.frequentItems(df, "item", denom)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * denom > xs.size }
        .toSeq.sortBy(_._1)
      assert(got == exact, s"denom=$denom mismatch")
      assert(got.nonEmpty || denom == 50 || exact.isEmpty)
    }
  }

  test("frequentItems stays exact when the domain dwarfs the capacity") {
    import spark.implicits._
    // 30k distinct tail items vs capacity 4*40=160: the sketch must
    // wade through a domain 200x its size and still emit exactly the
    // planted head
    val rnd = new Random(23)
    val planted = Seq.fill(3000)("whale") ++
      Seq.fill(60000)(s"k${rnd.nextInt(30000)}")
    val got = HeavyHitters.frequentItems(
      rnd.shuffle(planted).toDF("item").repartition(11), "item", denom = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = planted.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 40 > planted.size }.toSeq.sorted
    assert(got.sorted == exact)
    assert(got.map(_._1).contains("whale"))
  }

  test("frequentTokens runs over the documents text column") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha alpha"),
      (2L, "alpha gamma beta alpha"),
      (3L, "alpha delta epsilon zeta")).toDF("doc_id", "text")
    val got = HeavyHitters.frequentTokens(docs, denom = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 12 tokens; only alpha (6 > 12/4=3) qualifies strictly
    assert(got == Map("alpha" -> 6L))
  }
}

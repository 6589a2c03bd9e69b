package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextRank

/** TextRank vs a sequential per-document reference, plus the
  * centrality/isolation/dangling corners.
  */
class TextRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential weighted PageRank over one doc's sentence graph. */
  private def refRanks(text: String, width: Int = 8, iters: Int = 5)
      : Map[Long, Double] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val sent = toks.zipWithIndex
      .map { case (t, i) => (i / width).toLong -> t }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val sids = sent.keys.toSeq.sorted
    val w = (for {
      a <- sids; b <- sids if a != b
      shared = (sent(a) & sent(b)).size if shared > 0
    } yield (a, b) -> shared.toLong).toMap
    val outw = sids.map(s => s -> w.collect { case ((x, _), v) if x == s => v }.sum).toMap
    val n = sids.size
    var r = sids.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val dang = sids.filter(outw(_) == 0L).map(r).sum
      r = sids.map { s =>
        val in = w.collect { case ((a, b), v) if b == s => v.toDouble * r(a) / outw(a) }.sum
        s -> (0.15 / n + 0.85 * (in + dang / n))
      }.toMap
    }
    r
  }

  test("distributed == sequential reference per doc, multi-doc isolation") {
    val texts = Seq(
      "alpha beta gamma delta eps zeta eta theta " + // s0
        "alpha beta gamma delta one two three four " + // s1: shares 4 with s0
        "alpha beta nine ten eleven twelve thirteen fourteen", // s2: shares 2/2
      "red green blue cyan magenta yellow black white " +
        "red green blue cyan other1 other2 other3 other4")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextRank.run(docs, numPartitions = 4).ranks
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(x => x._2 -> x._3).toMap }
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = refRanks(t)
      val g = got(i.toLong)
      assert(g.keySet === want.keySet)
      want.foreach { case (sid, r) =>
        assert(math.abs(g(sid) - math.rint(r * 1e6) / 1e6) < 2e-6,
          s"doc $i sid $sid: got ${g(sid)} want $r")
      }
    }
  }

  test("the sentence sharing with everyone ranks first") {
    // s0 shares with both s1 and s2; s1 and s2 share only via s0's
    // tokens -> s0 is the most central
    val t = "hub1 hub2 hub3 hub4 fill1 fill2 fill3 fill4 " +
      "hub1 hub2 left1 left2 left3 left4 left5 left6 " +
      "hub3 hub4 right1 right2 right3 right4 right5 right6"
    val docs = Seq((7L, t)).toDF("doc_id", "text")
    val res = TextRank.run(docs, numPartitions = 2, topK = 1)
    val top = res.summary.as[(Long, Long, Int)].collect()
    assert(top.toSeq === Seq((7L, 0L, 1)))
  }

  test("single-sentence doc: dangling fixed point rank 1.0") {
    val docs = Seq((1L, "only eight tokens in this one short doc"))
      .toDF("doc_id", "text")
    val r = TextRank.run(docs, numPartitions = 2).ranks
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 0L, 1.0)))
  }

  test("summary picks topK per doc in (rank desc, sid) order") {
    val t = "a b c d e f g h " + // s0
      "a b c d e f g i " +      // s1: shares 7 with s0
      "a b x y z w v u " +      // s2: shares 2/2 with s0/s1-ish
      "q r s t u2 v2 w2 x2"     // s3: isolated
    val docs = Seq((0L, t)).toDF("doc_id", "text")
    val res = TextRank.run(docs, numPartitions = 2, topK = 2)
    val top = res.summary.as[(Long, Long, Int)].collect().sortBy(_._3)
    assert(top.length === 2)
    assert(Set(top(0)._2, top(1)._2).subsetOf(Set(0L, 1L)),
      "the heavily-shared pair outranks the rest")
  }
}

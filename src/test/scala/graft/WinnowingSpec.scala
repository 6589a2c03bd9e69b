package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Curation

/** Winnowing: sequential reference parity, the SWA guarantee, and
  * the density bound.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refWinnow(text: String, n: Int = 5, w: Int = 4)
      : Set[(Long, Long)] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def tv(t: String): Long =
      t.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 2147483648L)
    val grams = (0 to toks.length - n).map { g =>
      val psum = (0 until n).map(j => (j + 1).toLong * tv(toks(g + j))).sum
      g.toLong -> ((psum % 2147483648L) * 2654435761L % 2147483648L)
    }
    (0 to grams.length - w).map { s =>
      grams.slice(s, s + w).minBy { case (p, h) => (h, p) }
    }.toSet
  }

  test("distributed == sequential reference") {
    val text = (0 until 60).map(i => s"tok${(i * 7) % 13}w${i % 5}").mkString(" ")
    val got = Curation.winnowing(Seq((3L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().map(r => (r._2, r._3)).toSet
    val want = refWinnow(text).map { case (p, h) => (p, h) }
    assert(got === want)
  }

  test("guarantee: a shared run of >= w+n-1 tokens shares a fingerprint") {
    val shared = (0 until 8).map(i => s"common$i").mkString(" ") // 8 = w+n-1
    val a = "alpha beta gamma " + shared + " delta eps"
    val b = "uno dos " + shared + " tres quatro cinco seis"
    val fps = Curation.winnowing(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
    val f1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, "shared run must share a fingerprint")
  }

  test("density: far fewer selections than grams, none outside range") {
    val text = (0 until 400).map(i => s"t${(i * 31 + 7) % 97}").mkString(" ")
    val sel = Curation.winnowing(Seq((0L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
    val grams = 400 - 5 + 1
    assert(sel.length < grams / 2, s"${sel.length} of $grams selected")
    assert(sel.forall(r => r._2 >= 0 && r._2 < grams))
  }

  test("matches: planted copy pair dominates; boilerplate fp capped out") {
    val body = (0 until 40).map(i => s"body${(i * 11) % 29}x$i").mkString(" ")
    val boiler = "common header line all documents share here now ok"
    val docs = Seq(
      (1L, boiler + " " + body),
      (2L, boiler + " " + body + " extra tail"), // near-copy of 1
      (3L, boiler + " totally different content words here indeed yes")) ++
      (10L until 70L).map(i =>
        (i, boiler + " " + (0 until 30).map(j => s"u${i}v$j").mkString(" ")))
    val fps = Curation.winnowing(docs.toDF("doc_id", "text"))
    val m = Curation.winnowingMatches(fps, maxDocsPerFp = 10)
      .as[(Long, Long, Long)].collect()
    val best = m.maxBy(_._3)
    assert((best._1, best._2) === ((1L, 2L)), s"got ${m.toSeq.sortBy(-_._3).take(3)}")
    // the boilerplate prefix is held by 63 docs > cap, so distinct
    // random-body docs must NOT pair through it
    assert(!m.exists { case (a, b, _) => a >= 10L && b >= 10L },
      "boilerplate-only pairs must be capped out")
  }

  test("partition invariance") {
    val docs = (0L until 12L)
      .map(i => (i, (0 until 50).map(j => s"w${(i + j * 3) % 17}").mkString(" ")))
    val a = Curation.winnowing(docs.toDF("doc_id", "text").repartition(2))
      .as[(Long, Long, Long)].collect().toSet
    val b = Curation.winnowing(docs.toDF("doc_id", "text").repartition(13))
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }
}

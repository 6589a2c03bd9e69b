package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.BpeTrain

/** BPE merge induction vs an independent sequential reference
  * implementation (the Sennrich et al. 2016 algorithm written straight
  * from the paper, driver-side), plus the published worked example and
  * the overlap/non-overlap semantics corner.
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ── sequential reference: pure Scala, no Spark ─────────────────────
  private def refSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ "</w>"

  private def refPairCounts(words: Map[Vector[String], Long]): Map[(String, String), Long] =
    words.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(corpus: Seq[String], numMerges: Int,
                       minCount: Long = 2L): Seq[(String, String, Long)] = {
    var words = corpus.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => refSymbols(w) -> xs.size.toLong }
    val out = Seq.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < numMerges && !stop) {
      val pc = refPairCounts(words)
      if (pc.isEmpty) stop = true
      else {
        val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minCount) stop = true
        else {
          out += ((l, r, c))
          words = words.toSeq.map { case (s, f) => refMerge(s, l, r) -> f }
            .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
          k += 1
        }
      }
    }
    out.result()
  }

  private val sennrich: Seq[String] = Seq(
    Seq.fill(5)("low"), Seq.fill(2)("lower"),
    Seq.fill(6)("newest"), Seq.fill(3)("widest")).flatten

  test("worked example: merge sequence on the Sennrich corpus") {
    val docs = Seq((0L, sennrich.mkString(" "))).toDF("doc_id", "text")
    val res = BpeTrain.train(docs, numMerges = 5)
    val got = res.merges.map(m => (m.left, m.right, m.pairCount))
    // (e,s)=9 ties (es,t)-to-come chain; tie-break is (left, right) asc
    assert(got === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L)))
  }

  test("distributed == sequential reference on a mixed corpus, 12 merges") {
    val corpus = (0 until 40).map { i =>
      val ws = Seq("spark", "sparse", "parse", "part", "party", "stream",
        "streams", "stride", "string", "strong", "merge", "merges")
      (0 until 6).map(j => ws((i * 7 + j * 3) % ws.length)).mkString(" ")
    }
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = BpeTrain.train(docs, numMerges = 12).merges
      .map(m => (m.left, m.right, m.pairCount))
    assert(got === refTrain(corpus, 12))
  }

  test("overlap counting and non-overlapping merge: aaa") {
    // 'aaaa' x3 + 'aaa' x2: (a,a) counts 3*3 + 2*2 = 13 (overlapping);
    // the merge is left-to-right non-overlapping: aaaa->[aa,aa], aaa->[aa,a]
    val docs = Seq((0L, "aaaa aaaa aaaa aaa aaa")).toDF("doc_id", "text")
    val res = BpeTrain.train(docs, numMerges = 1)
    assert(res.merges.head.left === "a" && res.merges.head.right === "a")
    assert(res.merges.head.pairCount === 13L)
    val seg = Seq("aaaa", "aaa").toDF("word")
      .select(BpeTrain.segment(col("word"), res.merges).as("syms"))
      .as[Seq[String]].collect()
    assert(seg(0) === Seq("aa", "aa", "</w>"))
    assert(seg(1) === Seq("aa", "a", "</w>"))
  }

  test("segment replays training segmentation; vocab counts match") {
    val docs = Seq((0L, sennrich.mkString(" "))).toDF("doc_id", "text")
    val res = BpeTrain.train(docs, numMerges = 5)
    val seg = Seq("lowest").toDF("word")
      .select(BpeTrain.segment(col("word"), res.merges).as("syms"))
      .as[Seq[String]].collect().head
    // merges: (e,s) (es,t) (est,</w>) (l,o) (lo,w) -> low|est</w>
    assert(seg === Seq("low", "est</w>"))
    val vocab = res.vocab.as[(String, Long)].collect().toMap
    // after 5 merges both low(5) and lower(2) carry the fused "low"
    assert(vocab("low") === 7L)
    assert(vocab("est</w>") === 9L)
    assert(!vocab.contains("lo"))
  }

  test("driver-local trainer == distributed fallback, merges and vocab") {
    val corpus = (0 until 30).map { i =>
      val ws = Seq("merge", "merges", "merged", "spark", "sparse", "stream",
        "streams", "str", "strong", "parse")
      (0 until 5).map(j => ws((i * 11 + j * 5) % ws.length)).mkString(" ")
    }
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val local = BpeTrain.train(docs, numMerges = 10)
    val dist = BpeTrain.train(docs, numMerges = 10, maxLocalWords = 0L)
    assert(local.merges === dist.merges)
    assert(local.vocab.as[(String, Long)].collect().toMap ===
      dist.vocab.as[(String, Long)].collect().toMap)
  }

  test("early stop below minPairCount") {
    val docs = Seq((0L, "ab cd ef")).toDF("doc_id", "text")
    val res = BpeTrain.train(docs, numMerges = 10, minPairCount = 2L)
    assert(res.merges.isEmpty)
  }
}

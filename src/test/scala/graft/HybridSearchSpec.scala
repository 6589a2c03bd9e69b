package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.HybridSearch

/** RRF fusion invariants on a tiny corpus where both source rankings
  * are known by construction.
  */
class HybridSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hybrid search: doc in both rankings outranks single-source docs") {
    // doc 1: term hit AND vector near-identical to the query (vec 0)
    // doc 2: term hit only; doc 3: vector only; doc 4: neither
    val docs = Seq(
      (1L, "spark joins are fast"),
      (2L, "spark spark spark everywhere"),
      (3L, "completely unrelated prose"),
      (4L, "also nothing to see")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),   // the query vector
      (1L, Array(0.99f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.9f, 0.2f, 0f)),
      (4L, Array(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = HybridSearch.search(docs, emb, Seq("spark"), queryVecId = 0L,
      k = 4, kSource = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.head._1 == 1L, s"dual-source doc must fuse highest: ${got.toSeq}")
    // every fused score is a sum of 1/(60+rank) terms: bounded by 2/61
    assert(got.forall(_._2 <= 2.0 / 61 + 1e-9))
    // determinism: identical rerun, identical rows
    val again = HybridSearch.search(docs, emb, Seq("spark"), queryVecId = 0L,
      k = 4, kSource = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == again.toSeq)
  }

  // ── MMR diversification ────────────────────────────────────────────

  test("mmr: near-duplicate runner-up is demoted below a diverse hit") {
    // 1 and 2 are near-identical high-relevance vectors; 3 is diverse
    // with slightly lower relevance. Pure relevance ranks 1,2,3 — MMR
    // at λ=0.7 must pick the diverse 3 before the duplicate 2.
    val cand = Seq(
      (1L, 0.99, Array(1f, 0f, 0f)),
      (2L, 0.98, Array(0.999f, 0.04f, 0f)),
      (3L, 0.80, Array(0f, 1f, 0f))
    ).toDF("id", "rel", "embedding")
    val order = HybridSearch.mmrRerank(spark, cand, k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(order == Seq(1L, 3L, 2L), s"got $order")
  }

  test("mmr: lambda = 1 degenerates to pure relevance order") {
    val cand = Seq(
      (1L, 0.9, Array(1f, 0f, 0f)),
      (2L, 0.95, Array(0.999f, 0.04f, 0f)),
      (3L, 0.5, Array(0f, 1f, 0f))
    ).toDF("id", "rel", "embedding")
    val order = HybridSearch.mmrRerank(spark, cand, k = 3,
        lambdaNum = 1, lambdaDen = 1)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(order == Seq(2L, 1L, 3L))
  }

  test("mmr: fewer candidates than k returns them all, exact scores") {
    val cand = Seq((5L, 0.5, Array(1f, 0f, 0f))).toDF("id", "rel", "embedding")
    val rows = HybridSearch.mmrRerank(spark, cand, k = 8).collect()
    assert(rows.length == 1)
    // 7 * round(0.5 * 1e5) = 350000, no penalty on the first pick
    assert(rows(0).getLong(2) == 7L * 50000L)
  }
}

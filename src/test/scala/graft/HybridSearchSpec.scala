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
}

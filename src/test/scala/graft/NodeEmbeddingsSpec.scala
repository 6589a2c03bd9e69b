package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.NodeEmbeddings

/** Random-indexing embedding invariants: signature arithmetic, count
  * linearity, context-multiset equivalence, and the vectors() pivot.
  */
class NodeEmbeddingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // scala replica of the ±1 signature for hand-checks
  def signRef(context: Long, dim: Long): Long = {
    val P = 2147483647L
    val s0 = ((context % P) * 2048L + dim) % P
    val q1 = (s0 * (s0 + 3L)) % P
    val q2 = (q1 * (q1 + 7L)) % P
    if (q2 % 2 == 0) 1L else -1L
  }

  test("single pair: value[d] = cnt * sign(context, d) exactly") {
    val emb = NodeEmbeddings.randomIndexing(
        Seq((1L, 5L, 3L)).toDF("center", "context", "cnt"), dims = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(emb.size == 8)
    (0L to 7L).foreach(d => assert(emb(d) == 3L * signRef(5L, d)))
    // signatures are ±1, never 0, and not constant across dims
    assert(emb.values.map(math.abs).forall(_ == 3L))
    assert(emb.values.toSet.size == 2, s"degenerate signature: $emb")
  }

  test("same context multiset => identical embeddings") {
    val pairs = Seq(
      (1L, 5L, 2L), (1L, 9L, 1L),
      (2L, 9L, 1L), (2L, 5L, 2L)).toDF("center", "context", "cnt")
    val emb = NodeEmbeddings.randomIndexing(pairs, dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0L to 15L).foreach(d => assert(emb((1L, d)) == emb((2L, d))))
  }

  test("embedding is linear in the counts") {
    val base = Seq((1L, 5L, 1L), (1L, 9L, 2L)).toDF("center", "context", "cnt")
    val twice = Seq((1L, 5L, 2L), (1L, 9L, 4L)).toDF("center", "context", "cnt")
    val a = NodeEmbeddings.randomIndexing(base, dims = 8)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val b = NodeEmbeddings.randomIndexing(twice, dims = 8)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    (0L to 7L).foreach(d => assert(b(d) == 2L * a(d)))
  }

  test("vectors(): one row per id, dim-ordered float array") {
    val pairs = Seq((1L, 5L, 3L), (2L, 7L, 1L)).toDF("center", "context", "cnt")
    val emb = NodeEmbeddings.randomIndexing(pairs, dims = 4)
    val vecs = NodeEmbeddings.vectors(emb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(vecs.keySet == Set(1L, 2L))
    assert(vecs(1L) == (0L to 3L).map(d => (3L * signRef(5L, d)).toFloat))
    assert(vecs(2L) == (0L to 3L).map(d => signRef(7L, d).toFloat))
  }

  test("pmiScores: hand-computed ratios, and pmi = ln(pmi_ratio)") {
    val pairs = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 1L, 2L),
      (3L, 1L, 1L), (2L, 3L, 3L)).toDF("center", "context", "cnt")
    // N = 9; c_center: 1→3, 2→5, 3→1; c_context: 2→2, 3→4, 1→3
    val rows = NodeEmbeddings.pmiScores(pairs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val expected = Map(
      (1L, 2L) -> (2L, 2.0 * 9 / (3 * 2)),
      (1L, 3L) -> (1L, 1.0 * 9 / (3 * 4)),
      (2L, 1L) -> (2L, 2.0 * 9 / (5 * 3)),
      (3L, 1L) -> (1L, 1.0 * 9 / (1 * 3)),
      (2L, 3L) -> (3L, 3.0 * 9 / (5 * 4)))
    assert(rows.keySet == expected.keySet)
    for ((k, (cnt, ratio)) <- expected) {
      val (gc, gr, gp) = rows(k)
      assert(gc == cnt && gr == ratio, s"pair $k")
      // Spark's Log and scala.math.log can differ in the last ulp —
      // the exact reason pmi stays OUT of the cross-engine oracle
      assert(math.abs(gp - math.log(ratio)) <= math.ulp(gp),
        s"pmi of $k must be ln(ratio) within 1 ulp")
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Eigenvector, PageRank, Salsa, SimRank, Triangles}
import graft.graph.GraphOps

/** Fixtures for the round-3 link-analysis additions: eigenvector
  * centrality (power iteration), SALSA (degree-normalized HITS),
  * 4-clique counting, and pruned-pair SimRank.
  */
class LinkAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  // ───────────────────────── eigenvector ─────────────────────────

  test("eigenvector: matches a dense same-arithmetic power iteration") {
    // triangle {1,2,3} + pendant 4 on 3 — non-bipartite, so the
    // iteration is well-behaved; compare 5 distributed rounds against
    // a local replica with identical per-round arithmetic
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val sym = GraphOps.symmetrize(edges(und: _*))
    val got = Eigenvector.run(spark, sym, numPartitions = 4, maxIter = 5)
      .scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2) }
    var x = adj.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      val raw = adj.map { case (v, ns) => v -> ns.map(x).sum }
      val n = math.sqrt(raw.values.map(r => r * r).sum)
      x = raw.map { case (v, r) => v -> r / n }
    }
    assert(got.keySet == x.keySet)
    x.foreach { case (v, e) => assert(math.abs(got(v) - e) < 1e-12, s"v=$v") }
  }

  test("eigenvector: symmetric vertices get equal centrality at convergence") {
    val sym = GraphOps.symmetrize(edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    val r = Eigenvector.run(spark, sym, numPartitions = 4, tol = 1e-12,
      maxIter = 200)
    assert(r.converged)
    val m = r.scores.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(m(1L) - m(2L)) < 1e-9)   // 1 and 2 are exchangeable
    assert(m(3L) > m(1L) && m(1L) > m(4L))   // hub > triangle > pendant
    assert(math.abs(m.values.map(v => v * v).sum - 1.0) < 1e-9) // unit L2
  }

  // ─────────────────────────── SALSA ───────────────────────────

  test("salsa: stationary authority ∝ indeg, hub ∝ outdeg (connected support)") {
    // hubs {1,2} and authorities {3,4,5}; the authority support graph
    // is connected and aperiodic, so the chains converge to the
    // degree distributions (Lempel & Moran §3.1)
    val e = edges((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (2L, 5L))
    val r = Salsa.run(spark, e, numPartitions = 4, tol = 1e-12, maxIter = 500)
    assert(r.converged)
    val m = r.scores.collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    // auth: indeg 2,2,1 over total 5
    assert(math.abs(m(3L)._2 - 0.4) < 1e-9)
    assert(math.abs(m(4L)._2 - 0.4) < 1e-9)
    assert(math.abs(m(5L)._2 - 0.2) < 1e-9)
    // hub: outdeg 2,3 over total 5
    assert(math.abs(m(1L)._1 - 0.4) < 1e-9)
    assert(math.abs(m(2L)._1 - 0.6) < 1e-9)
    // pure authorities have zero hub mass and vice versa
    assert(m(3L)._1 == 0.0 && m(1L)._2 == 0.0)
  }

  // ───────────────────────── 4-cliques ─────────────────────────

  def complete(n: Int): Seq[(Long, Long)] =
    for { i <- 0 until n; j <- i + 1 until n } yield (i.toLong, j.toLong)

  test("cliques4: K5 has 5, K4 has 1, C5 has 0") {
    assert(Triangles.countCliques4(spark,
      GraphOps.undirectedPairs(edges(complete(5): _*)), 4) == 5L)
    assert(Triangles.countCliques4(spark,
      GraphOps.undirectedPairs(edges(complete(4): _*)), 4) == 1L)
    val c5 = (0 until 5).map(i => (i.toLong, ((i + 1) % 5).toLong))
    assert(Triangles.countCliques4(spark,
      GraphOps.undirectedPairs(edges(c5: _*)), 4) == 0L)
  }

  test("cliques4: two K4s sharing a triangle count 2; K6 counts C(6,4)") {
    // {1,2,3,4} and {1,2,3,5} complete, 4–5 absent
    val twoK4 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L),
      (1L, 5L), (2L, 5L), (3L, 5L))
    assert(Triangles.countCliques4(spark,
      GraphOps.undirectedPairs(edges(twoK4: _*)), 4) == 2L)
    assert(Triangles.countCliques4(spark,
      GraphOps.undirectedPairs(edges(complete(6): _*)), 4) == 15L)
  }

  test("cliques4: the edge-triangle cap drops hot edges explicitly") {
    // in K5 every oriented edge closes ≤ 3 triangles; cap at 1 kills
    // every candidate pair, cap at 0 (unlimited) restores the count
    val und = GraphOps.undirectedPairs(edges(complete(5): _*))
    assert(Triangles.countCliques4(spark, und, 4, maxEdgeTriangles = 1) == 0L)
    assert(Triangles.countCliques4(spark, und, 4, maxEdgeTriangles = 0) == 5L)
  }

  // ────────────────────────── SimRank ──────────────────────────

  test("simrank: same single in-neighbor gives s = C from iteration 1 on") {
    val e = edges((10L, 1L), (10L, 2L)) // 10→1, 10→2
    val s = SimRank.run(spark, e, c = 0.75, maxIter = 5, numPartitions = 4)
      .scores.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(s == Map((1L, 2L) -> 0.75))
  }

  test("simrank: dyadic fixed point through a shared + distinct in-neighbor mix") {
    // c→a, c→b (shared), d→a, e→b (distinct), f→d, f→e (d,e share f):
    //   s(d,e) = 0.75 from iter 1; s(a,b) → 0.75/4 · (1 + s(d,e))
    //          = 0.328125 exactly (all values dyadic — exact doubles)
    val (a, b, c, d, e, f) = (1L, 2L, 3L, 4L, 5L, 6L)
    val g = edges((c, a), (c, b), (d, a), (e, b), (f, d), (f, e))
    val s = SimRank.run(spark, g, c = 0.75, maxIter = 5, numPartitions = 4)
      .scores.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(s((d, e)) == 0.75)
    assert(s((a, b)) == 0.328125)
    assert(s.size == 2) // only co-citation pairs are scored (pruned set)
  }

  // ─────────────────── warm-start PageRank ───────────────────

  test("pagerank warm start: converged ranks restart in one step, scale-invariant") {
    val sym = GraphOps.symmetrize(
      edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    val cold = PageRank.run(spark, sym, numPartitions = 4, tol = 1e-10)
    assert(cold.converged)
    val prior = cold.ranks
    // restarting FROM the fixed point converges immediately
    val warm = PageRank.run(spark, sym, numPartitions = 4, tol = 1e-9,
      init = Some(prior))
    assert(warm.converged && warm.iterations <= 2,
      s"warm restart took ${warm.iterations} iterations")
    val c = cold.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = warm.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    c.foreach { case (v, r) => assert(math.abs(w(v) - r) < 1e-8) }
    // init renormalizes, so a scaled prior gives the same trajectory
    val scaled = PageRank.run(spark, sym, numPartitions = 4, tol = 0.0,
      maxIter = 3, init = Some(prior.select(col("id"),
        (col("rank") * 1024.0).as("rank")))) // dyadic scale: exact ÷
    val base = PageRank.run(spark, sym, numPartitions = 4, tol = 0.0,
      maxIter = 3, init = Some(prior))
    val sm = scaled.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.ranks.collect().foreach(r =>
      assert(sm(r.getLong(0)) == r.getDouble(1)))
  }

  test("pagerank warm start: vertices missing from the prior default to 1/n") {
    val sym = GraphOps.symmetrize(edges((1L, 2L), (2L, 3L)))
    val partial = Seq((1L, 0.9)).toDF("id", "rank") // 2 and 3 unseen
    val r = PageRank.run(spark, sym, numPartitions = 4, tol = 0.0, maxIter = 1,
      init = Some(partial))
    // after renormalization r0 = (0.9, 1/3, 1/3)/Σ; one step keeps mass 1
    val mass = r.ranks.agg(sum(col("rank"))).first().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-9)
  }

  // ─────────────────── disparity backbone ───────────────────

  test("disparity backbone: locally-dominant edge kept, diluted edges cut") {
    // hub 10 with weights 10/1/1 (k=3, s=12): α(10–1) = (1/6)² ≈ 0.028
    // keeps, α(10–2) = α(10–3) = (11/12)² ≈ 0.84 cuts (leaf side is
    // k=1 → null); isolated pair 20–21 is untestable → kept
    val pairs = Seq((1L, 10L, 10L), (2L, 10L, 1L), (3L, 10L, 1L),
      (20L, 21L, 5L)).toDF("src", "dst", "weight")
    val out = GraphOps.disparityBackbone(pairs, alpha = 0.05)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)), Option(r.get(4)), r.getBoolean(5))).toMap
    val (aSrc, aDst, keepHub) = out((1L, 10L))
    assert(aSrc.isEmpty)                               // leaf k=1 → null
    assert(math.abs(aDst.get.asInstanceOf[Double] - 1.0 / 36) < 1e-12)
    assert(keepHub)
    assert(!out((2L, 10L))._3 && !out((3L, 10L))._3)   // diluted: cut
    assert(out((20L, 21L)) == (None, None, true))      // untestable: kept
  }

  test("simrank: scores are bounded by C and the pair set obeys the caps") {
    // star-ish burst: one center fans out to 6 targets → C(6,2) pairs,
    // each s = C; an over-cap center (outdeg > cap) produces none
    val burst = (1L to 6L).map(i => (100L, i))
    val s1 = SimRank.run(spark, edges(burst: _*), c = 0.75, maxIter = 3,
      numPartitions = 4).scores
    assert(s1.count() == 15)
    assert(s1.agg(max(col("s"))).first().getDouble(0) == 0.75)
    val s2 = SimRank.run(spark, edges(burst: _*), c = 0.75, maxIter = 3,
      numPartitions = 4, maxCenterOutDegree = 5).scores
    assert(s2.count() == 0)
  }

  // ─────────────────────── batched PPR ───────────────────────────

  test("batchPersonalized: directed cycle hand values, sparse frontier") {
    // 1→2→3→1, seed {1}: rank spreads one hop per iteration
    val cyc = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val seeds = Seq((1L, 1L)).toDF("sid", "id")
    val d = 0.85
    val r2 = PageRank.batchPersonalized(spark, cyc, seeds,
        numPartitions = 2, iters = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // rank reaches v3 only at iter 2; v1 sees no in-flow before iter 3
    assert(r2(1L) == (1.0 - d) * 1.0)
    assert(r2(2L) == d * ((1.0 - d) * 1.0))
    assert(r2(3L) == d * (d * 1.0))
    assert(r2.size == 3)
  }

  test("batchPersonalized: per-sid ranks match single-seed-set run()") {
    // two triangles bridged by one edge; seed sets on either side
    val g = edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L))
    val seeds = Seq((1L, 1L), (2L, 5L)).toDF("sid", "id")
    val batch = PageRank.batchPersonalized(spark, g, seeds,
        numPartitions = 4, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((sid, seed) <- Seq((1L, 1L), (2L, 5L))) {
      val single = PageRank.run(spark, g, numPartitions = 4, tol = 0.0,
          maxIter = 5, seeds = Some(Seq(seed).toDF("id")))
        .ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      for ((id, r) <- single)
        if (r == 0.0) assert(!batch.contains((sid, id)))
        else assert(math.abs(batch((sid, id)) - r) < 1e-12,
          s"sid=$sid id=$id batch=${batch.get((sid, id))} single=$r")
    }
  }

  test("batchPersonalized: disjoint components never bleed across sets") {
    val g = edges((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
    val seeds = Seq((1L, 1L), (2L, 10L)).toDF("sid", "id")
    val out = PageRank.batchPersonalized(spark, g, seeds,
        numPartitions = 2, iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 2L), (2L, 10L), (2L, 11L)))
  }

  test("classify: argmax with min-sid tie-break on the batch output") {
    val ranks = Seq(
      (1L, 10L, 0.4), (2L, 10L, 0.6),   // clear winner sid 2
      (1L, 11L, 0.5), (2L, 11L, 0.5),   // tie -> sid 1
      (2L, 12L, 0.3)                     // only one set reaches 12
    ).toDF("sid", "id", "rank")
    val got = PageRank.classify(ranks)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(10L) == (2L, 0.6))
    assert(got(11L) == (1L, 0.5))
    assert(got(12L) == (2L, 0.3))
  }

  test("batchPersonalized rejects seeds that are not vertices") {
    val g = edges((1L, 2L))
    val bad = Seq((1L, 99L)).toDF("sid", "id")
    assertThrows[IllegalArgumentException] {
      PageRank.batchPersonalized(spark, g, bad, numPartitions = 2, iters = 1)
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.sim.KnnGraph

/** NN-Descent k-NN graph vs an exact sequential reference, recall
  * against brute force on separable blobs, per-round monotone
  * improvement, partition invariance.
  */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 2147483647L

  private def scramble(key: Long): Long = {
    val vp = Math.floorMod(key, P)
    val q1 = Math.floorMod(vp * (vp + 3L), P)
    Math.floorMod(q1 * (q1 + 7L), P)
  }

  private def iv(v: Seq[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * 100000).toLong)

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** The exact same deterministic NN-Descent, sequentially. */
  private def refKnn(vecs: Seq[(Long, Seq[Float])], k: Int, rounds: Int,
                     revCap: Int): Map[Long, Seq[(Long, Long)]] = {
    val ivs = vecs.map { case (i, v) => i -> iv(v) }.toMap
    val n = vecs.size.toLong
    def topK(cand: Seq[(Long, Long, Long)], cap: Int)
        : Map[Long, Seq[(Long, Long)]] =
      cand.map { case (s, t, d) => s -> (d, t) }
        .groupBy(_._1)
        .map { case (s, xs) =>
          s -> xs.map(_._2).distinct.sorted.take(cap)
        }
    val init = for {
      v <- vecs.map(_._1)
      j <- 0L until k.toLong
    } yield {
      val u = Math.floorMod(
        v + 1L + Math.floorMod(scramble(v * 1000003L + j), n - 1), n)
      (v, u)
    }
    var nb = topK(init.distinct.map { case (a, b) => (a, b, d2(ivs(a), ivs(b))) }, k)
    for (_ <- 1 to rounds) {
      val revc = topK(
        nb.toSeq.flatMap { case (s, ts) => ts.map { case (d, t) => (t, s, d) } },
        revCap)
      val adj = (nb.toSeq.flatMap { case (v, ts) => ts.map(t => (v, t._2)) } ++
        revc.toSeq.flatMap { case (v, ts) => ts.map(t => (v, t._2)) }).distinct
      val byV = adj.groupBy(_._1)
      val pairs = byV.values.flatMap { es =>
        val us = es.map(_._2)
        for (a <- us; b <- us if a < b) yield (a, b)
      }.toSeq.distinct
      val newE = pairs.flatMap { case (a, b) =>
        val d = d2(ivs(a), ivs(b)); Seq((a, b, d), (b, a, d))
      }
      val cand = nb.toSeq.flatMap { case (s, ts) =>
        ts.map { case (d, t) => (s, t, d) } } ++ newE
      nb = topK(cand, k)
    }
    nb
  }

  private def blob(id: Long, c: Int, dims: Int): Seq[Float] =
    (0 until dims).map { d =>
      (if (d == c) 1.0f else 0.0f) +
        0.01f * Math.floorMod(scramble(id * 31L + d), 100L)
    }

  private def toDf(vecs: Seq[(Long, Seq[Float])]) =
    vecs.toDF("vec_id", "embedding")

  test("exact parity with the sequential reference") {
    val vecs = (0L until 40L).map(i => i -> blob(i, (i % 3).toInt, 4))
    val got = KnnGraph.run(spark, toDf(vecs), k = 3, rounds = 2)
      .neighbors.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.map { case (_, t, d) => (d, t) }.toSeq.sorted }
    val want = refKnn(vecs, k = 3, rounds = 2, revCap = 3)
    assert(got.keySet === want.keySet)
    for (s <- want.keySet) assert(got(s) === want(s), s"src=$s")
  }

  test("recall vs brute force on separable blobs") {
    val vecs = (0L until 120L).map(i => i -> blob(i, (i % 3).toInt, 6))
    val ivs = vecs.map { case (i, v) => i -> iv(v) }.toMap
    val k = 5
    val exact = vecs.map { case (i, _) =>
      i -> vecs.collect { case (j, _) if j != i => (d2(ivs(i), ivs(j)), j) }
        .sorted.take(k).map(_._2).toSet
    }.toMap
    val got = KnnGraph.run(spark, toDf(vecs), k = k, rounds = 3)
      .neighbors.as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val recall = vecs.map { case (i, _) =>
      (got(i) intersect exact(i)).size.toDouble / k }.sum / vecs.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("neighbor lists only improve round over round") {
    val vecs = (0L until 60L).map(i => i -> blob(i, (i % 2).toInt, 5))
    def total(rounds: Int): Long =
      KnnGraph.run(spark, toDf(vecs), k = 4, rounds = rounds)
        .neighbors.as[(Long, Long, Long)].collect().map(_._3).sum
    val t = (0 to 2).map(total)
    assert(t(1) <= t(0) && t(2) <= t(1), s"totals=$t")
  }

  test("partition invariance") {
    val vecs = (0L until 50L).map(i => i -> blob(i, (i % 3).toInt, 4))
    def runAt(p: Int) =
      KnnGraph.run(spark, toDf(vecs).repartition(p), k = 3, rounds = 2)
        .neighbors.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(runAt(1) === runAt(7))
  }

  /** Sequential replay of the greedy beam search. */
  private def refSearch(vecs: Seq[(Long, Seq[Float])],
                        graph: Map[Long, Seq[(Long, Long)]],
                        queryIds: Seq[Long], k: Int, beam: Int,
                        rounds: Int): Map[Long, Seq[(Long, Long)]] = {
    val ivs = vecs.map { case (i, v) => i -> iv(v) }.toMap
    val n = vecs.size.toLong
    val seeds = (0L until beam.toLong).map(_ * (n / beam)).distinct
    def top(cand: Seq[(Long, Long)], cap: Int): Seq[(Long, Long)] =
      cand.distinct.sorted.take(cap)
    queryIds.map { qid =>
      val qv = ivs(qid)
      var state = top(seeds.map(s => (d2(qv, ivs(s)), s)), beam)
      for (_ <- 1 to rounds) {
        val expand = state.flatMap { case (_, c) =>
          graph.getOrElse(c, Nil).map(_._2) }.distinct
        state = top(state ++ expand.map(u => (d2(qv, ivs(u)), u)), beam)
      }
      qid -> top(state, k)
    }.toMap
  }

  test("search: exact parity with the sequential reference") {
    val vecs = (0L until 60L).map(i => i -> blob(i, (i % 3).toInt, 4))
    val df = toDf(vecs)
    val g = KnnGraph.run(spark, df, k = 3, rounds = 2)
    val queryIds = Seq(0L, 17L, 42L)
    val queries = df.filter(col("vec_id").isin(queryIds: _*))
    val got = KnnGraph.search(df, g.neighbors, queries,
      k = 3, beam = 6, rounds = 2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) =>
        q -> xs.map { case (_, t, d) => (d, t) }.toSeq.sorted }
    val refG = refKnn(vecs, k = 3, rounds = 2, revCap = 3)
    val want = refSearch(vecs, refG, queryIds, k = 3, beam = 6, rounds = 2)
    assert(got.keySet === want.keySet)
    for (q <- want.keySet) assert(got(q) === want(q), s"query=$q")
  }

  test("search: recall vs brute force on separable blobs") {
    val vecs = (0L until 120L).map(i => i -> blob(i, (i % 3).toInt, 6))
    val ivs = vecs.map { case (i, v) => i -> iv(v) }.toMap
    val df = toDf(vecs)
    val g = KnnGraph.run(spark, df, k = 5, rounds = 3)
    val queryIds = (0L until 120L by 20L).toSeq
    val queries = df.filter(col("vec_id").isin(queryIds: _*))
    val k = 5
    val exact = queryIds.map { q =>
      q -> vecs.map { case (j, _) => (d2(ivs(q), ivs(j)), j) }
        .sorted.take(k).map(_._2).toSet
    }.toMap
    val got = KnnGraph.search(df, g.neighbors, queries,
      k = k, beam = 12, rounds = 5)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val recall = queryIds.map { q =>
      (got(q) intersect exact(q)).size.toDouble / k }.sum / queryIds.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("guards: k >= n and bad k rejected") {
    val vecs = (0L until 5L).map(i => i -> blob(i, 0, 3))
    intercept[IllegalArgumentException] {
      KnnGraph.run(spark, toDf(vecs), k = 5, rounds = 1)
    }
    intercept[IllegalArgumentException] {
      KnnGraph.run(spark, toDf(vecs), k = 0, rounds = 1)
    }
  }
}

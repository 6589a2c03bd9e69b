package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Kmeans

/** Exact-grid Lloyd k-means vs a sequential reference, blob recovery,
  * empty-cluster handling, partition invariance.
  */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def iv(v: Seq[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * 100000).toLong)

  private def refKmeans(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int)
      : (Map[Long, (Long, Long)], Map[Long, Seq[Long]]) = {
    val ivs = vecs.map { case (i, v) => i -> iv(v) }.toMap
    var cents: Map[Long, Seq[Long]] = vecs.map(_._1).sorted.take(k)
      .zipWithIndex.map { case (id, c) => c.toLong -> ivs(id) }.toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(x: Seq[Long]): (Long, Long) =
      cents.toSeq.map { case (c, cv) => (d2(x, cv), c) }.min.swap
    for (_ <- 0 until iters) {
      val byC = ivs.toSeq.groupBy { case (_, x) => assign(x)._1 }
      cents = cents.map { case (c, old) =>
        c -> byC.get(c).map { xs =>
          val n = xs.size
          (0 until old.size).map { d =>
            val s = xs.map(_._2(d)).sum
            math.round(s.toDouble / n)
          }
        }.getOrElse(old)
      }
    }
    (ivs.map { case (id, x) => id -> assign(x) }, cents)
  }

  private val blobs: Seq[(Long, Seq[Float])] =
    (0L until 30L).map { i =>
      val base = if (i % 2 == 0) 0.3f else -0.3f
      i -> Seq.tabulate(6)(d => base + ((i * 13 + d * 7) % 9).toFloat / 1000f)
    }

  test("distributed == sequential reference, k=3, 3 iters") {
    val df = blobs.toDF("vec_id", "embedding")
    val res = Kmeans.run(df, k = 3, iters = 3)
    val got = res.assignment.as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (want, wantC) = refKmeans(blobs, 3, 3)
    assert(got === want)
    val gotC = res.centroids.as[(Long, Seq[Long])].collect().toMap
    assert(gotC === wantC)
  }

  test("two separated blobs recovered exactly, k=2") {
    val df = blobs.toDF("vec_id", "embedding")
    val res = Kmeans.run(df, k = 2, iters = 4)
    val a = res.assignment.as[(Long, Long, Long)].collect()
    val even = a.filter(_._1 % 2 == 0).map(_._2).toSet
    val odd = a.filter(_._1 % 2 == 1).map(_._2).toSet
    assert(even.size === 1 && odd.size === 1 && even != odd)
  }

  test("empty cluster keeps its previous centroid") {
    // three coincident-ish points, k=3: after round 1 every point
    // lands on one cluster; the empty ones must keep their seeds
    val pts = Seq((0L, Seq(0.1f, 0.1f)), (1L, Seq(0.1001f, 0.1f)),
      (2L, Seq(0.1f, 0.1001f)))
    val res = Kmeans.run(pts.toDF("vec_id", "embedding"), k = 3, iters = 2)
    assert(res.centroids.count() === 3L)
    val (_, wantC) = refKmeans(pts, 3, 2)
    assert(res.centroids.as[(Long, Seq[Long])].collect().toMap === wantC)
  }

  test("quality: separated blobs score high simplified silhouette") {
    val df = blobs.toDF("vec_id", "embedding")
    val q = Kmeans.quality(df, k = 2, iters = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(q.length === 2)
    q.foreach { case (_, n, inertia, sil) =>
      assert(n === 15L)
      assert(sil > 0.8, s"expected tight blobs, silhouette $sil")
      assert(inertia >= 0L)
    }
  }

  test("partition invariance") {
    val df = blobs.toDF("vec_id", "embedding")
    val a = Kmeans.run(df.repartition(2), k = 3, iters = 2)
      .assignment.as[(Long, Long, Long)].collect().toSet
    val b = Kmeans.run(df.repartition(11), k = 3, iters = 2)
      .assignment.as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }
}

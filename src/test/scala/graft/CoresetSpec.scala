package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Coreset

/** Gonzalez k-center vs a sequential reference with identical
  * integerized arithmetic, plus hand geometries and tie handling.
  */
class CoresetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def iv(v: Seq[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * 100000).toLong)

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def refKCenters(vecs: Seq[(Long, Seq[Float])], k: Int)
      : (Seq[(Long, Long, Long)], Map[Long, (Long, Long)]) = {
    val ivs = vecs.map { case (id, v) => id -> iv(v) }.toMap
    var best = ivs.keys.map(id => id -> (Long.MaxValue, -1L)).toMap
    var nextId = ivs.keys.min
    var nextD = 0L
    val centers = Seq.newBuilder[(Long, Long, Long)]
    for (r <- 0 until k) {
      centers += ((r.toLong, nextId, nextD))
      val cv = ivs(nextId)
      best = best.map { case (id, (bd, bc)) =>
        val d = d2(ivs(id), cv)
        id -> (if (d < bd) (d, nextId) else (bd, bc))
      }
      if (r + 1 < k) {
        val (id, (bd, _)) = best.minBy { case (id, (bd, _)) => (-bd, id) }
        nextId = id; nextD = bd
      }
    }
    (centers.result(), best.map { case (id, (bd, bc)) => id -> (bc, bd) })
  }

  private val cloudVecs: Seq[(Long, Seq[Float])] = (0L until 50L).map { i =>
    i -> Seq.tabulate(8)(d => (((i * 31 + d * 17) % 23).toFloat - 11f) / 23f)
  }

  test("distributed == sequential reference, k=6") {
    val df = cloudVecs.toDF("vec_id", "embedding")
    val res = Coreset.kCenters(df, k = 6)
    val (refCenters, refAssign) = refKCenters(cloudVecs, 6)
    assert(res.centers.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      === refCenters)
    val gotAssign = res.assignment.as[(Long, Long, Long)].collect()
      .map { case (id, c, d) => id -> (c, d) }.toMap
    assert(gotAssign === refAssign)
  }

  test("line geometry: farthest-first picks the extremes") {
    // points at x = 0, 1, 2, 100; seed = id 0 (x=0); next = x=100;
    // then x=2 (farthest from {0,100} is x=2 at d=4 vs x=1 at d=1)
    val pts = Seq((0L, Seq(0f)), (1L, Seq(0.001f)), (2L, Seq(0.002f)),
      (3L, Seq(0.1f))).toDF("vec_id", "embedding")
    val res = Coreset.kCenters(pts, k = 3)
    val order = res.centers.orderBy("rank").as[(Long, Long, Long)]
      .collect().map(_._2).toSeq
    assert(order === Seq(0L, 3L, 2L))
    // radius² after 3 centers = the remaining farthest point (x=1)
    val maxD = res.assignment.agg(max("dist_sq")).as[Long].head()
    assert(maxD === 100L * 100L) // 0.001 integerized = 100
  }

  test("duplicate points: ties resolve to the minimum id") {
    val pts = Seq((5L, Seq(0.5f)), (1L, Seq(0.0f)), (2L, Seq(0.0f)),
      (9L, Seq(0.5f))).toDF("vec_id", "embedding")
    val res = Coreset.kCenters(pts, k = 2)
    val order = res.centers.orderBy("rank").as[(Long, Long, Long)]
      .collect().map(_._2).toSeq
    assert(order === Seq(1L, 5L)) // seed min id; argmax tie 5 vs 9 -> 5
    val assign = res.assignment.as[(Long, Long, Long)].collect()
      .map { case (id, c, d) => id -> c }.toMap
    assert(assign(2L) === 1L && assign(9L) === 5L)
    assert(res.assignment.filter(col("dist_sq") =!= 0L).count() === 0L)
  }

  test("k = n selects every point with dist 0") {
    val pts = cloudVecs.take(5).toDF("vec_id", "embedding")
    val res = Coreset.kCenters(pts, k = 5)
    assert(res.centers.count() === 5L)
    assert(res.assignment.filter(col("dist_sq") =!= 0L).count() === 0L)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.RankCorrelation

/** Spearman-with-ties vs a sequential average-rank reference, plus
  * the closed-form corners.
  */
class RankCorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def refSpearman(pairs: Seq[(Long, Long)]): Option[Double] = {
    def avgRank2(xs: Seq[Long]): Map[Long, Long] = {
      val cnt = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      var cum = 0L
      cnt.keys.toSeq.sorted.map { v =>
        val r = v -> (2 * cum + cnt(v) + 1); cum += cnt(v); r
      }.toMap
    }
    val ra = avgRank2(pairs.map(_._1)); val rb = avgRank2(pairs.map(_._2))
    val n = BigInt(pairs.size)
    val a = pairs.map(p => BigInt(ra(p._1))); val b = pairs.map(p => BigInt(rb(p._2)))
    val (sa, sb) = (a.sum, b.sum)
    val sa2 = a.map(x => x * x).sum; val sb2 = b.map(x => x * x).sum
    val sab = a.zip(b).map { case (x, y) => x * y }.sum
    val dx = n * sa2 - sa * sa; val dy = n * sb2 - sb * sb
    if (dx == 0 || dy == 0) None
    else Some((n * sab - sa * sb).toDouble /
      (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
  }

  private def run(pairs: Seq[(Long, Long)]): (Long, Option[Double]) = {
    val df = pairs.toDF("a", "b")
    val row = RankCorrelation.spearman(spark, df, "a", "b").head()
    (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getDouble(1)))
  }

  test("distributed == sequential reference on a tied mixed sample") {
    val pairs = (0L until 120L).map(i => ((i * 7) % 15, (i * 11 + i / 20) % 13))
    val (n, got) = run(pairs)
    assert(n === 120L)
    val want = refSpearman(pairs).get
    assert(math.abs(got.get - math.rint(want * 1e6) / 1e6) < 1e-12)
  }

  test("perfect monotone = 1, reversed = -1") {
    val xs = (0L until 40L).map(i => (i, i * 3 + 5))
    assert(run(xs)._2.get === 1.0)
    assert(run(xs.map { case (a, b) => (a, -b) })._2.get === -1.0)
  }

  test("constant side yields null") {
    val xs = (0L until 10L).map(i => (i, 7L))
    assert(run(xs)._2.isEmpty)
  }

  test("ties average: interleaved duplicate scores") {
    // a = [0,0,1,1], b = [0,1,0,1] -> rho = 0 exactly
    val xs = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
    assert(run(xs)._2.get === 0.0)
  }

  // ── Kendall τ-b ────────────────────────────────────────────────────

  private def refKendall(pairs: Seq[(Long, Long)]): Option[Double] = {
    var c = 0L; var dsc = 0L; var ta = 0L; var tb = 0L
    for (i <- pairs.indices; j <- (i + 1) until pairs.size) {
      val sa = java.lang.Long.compare(pairs(i)._1, pairs(j)._1)
      val sb = java.lang.Long.compare(pairs(i)._2, pairs(j)._2)
      if (sa == 0) ta += 1
      if (sb == 0) tb += 1
      if (sa != 0 && sb != 0) { if (sa == sb) c += 1 else dsc += 1 }
    }
    val t = pairs.size.toLong * (pairs.size - 1) / 2
    if (t == ta || t == tb) None
    else Some((c - dsc).toDouble /
      (math.sqrt((t - ta).toDouble) * math.sqrt((t - tb).toDouble)))
  }

  private def runK(pairs: Seq[(Long, Long)]): (Long, Option[Double]) = {
    val df = pairs.toDF("a", "b")
    val row = RankCorrelation.kendall(spark, df, "a", "b").head()
    (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getDouble(1)))
  }

  test("kendall: distributed == pairwise reference with ties") {
    val pairs = (0L until 90L).map(i => ((i * 7) % 12, (i * 11 + i / 15) % 10))
    val (n, got) = runK(pairs)
    assert(n === 90L)
    val want = refKendall(pairs).get
    assert(math.abs(got.get - math.rint(want * 1e6) / 1e6) < 1e-12)
  }

  test("kendall: monotone = 1, reversed = -1, constant null") {
    val xs = (0L until 25L).map(i => (i, i * 2 + 3))
    assert(runK(xs)._2.get === 1.0)
    assert(runK(xs.map { case (a, b) => (a, -b) })._2.get === -1.0)
    assert(runK((0L until 8L).map(i => (i, 4L)))._2.isEmpty)
  }
}

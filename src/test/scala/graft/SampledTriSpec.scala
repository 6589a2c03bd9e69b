package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Triangles
import graft.graph.GraphOps

/** DOULION sampled triangles: degenerate exactness, determinism, and
  * an estimator-in-band check on a deterministic sample.
  */
class SampledTriSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val pairs = {
    // ring with chords 1..3: ~3 triangles per vertex (~900 total), so
    // the 1/27 triangle-survival rate leaves a solidly nonzero sample
    val v = 300L
    val e = (0L until v).flatMap { a =>
      Seq((a, (a + 1) % v), (a, (a + 2) % v), (a, (a + 3) % v))
    }.filter(p => p._1 != p._2)
    GraphOps.undirectedPairs(e.toDF("src", "dst"))
  }

  test("num = den keeps everything: estimate equals the exact count") {
    val exact = Triangles.countTriangles(spark, pairs, 4)
    val r = Triangles.sampledCount(spark, pairs, num = 1L, den = 1L,
      numPartitions = 4).head()
    assert(r.getLong(0) === pairs.count())
    assert(r.getLong(1) === exact)
    assert(r.getDouble(2) === exact.toDouble)
  }

  test("deterministic across partitionings; estimate within a loose band") {
    val exact = Triangles.countTriangles(spark, pairs, 4)
    val a = Triangles.sampledCount(spark, pairs, 1L, 3L, salt = 5L,
      numPartitions = 2).head()
    val b = Triangles.sampledCount(spark, pairs, 1L, 3L, salt = 5L,
      numPartitions = 16).head()
    assert(a.getLong(0) === b.getLong(0) && a.getLong(1) === b.getLong(1))
    // deterministic sample: the estimate is a fixed number; just check
    // it is a plausible unbiased draw (very loose band, no flakiness —
    // everything here is deterministic)
    assert(a.getDouble(2) > 0.15 * exact && a.getDouble(2) < 4.0 * exact,
      s"estimate ${a.getDouble(2)} vs exact $exact")
    // the sample rate itself lands near 1/3
    val m = pairs.count()
    assert(a.getLong(0) > m / 5 && a.getLong(0) < m / 2)
  }
}

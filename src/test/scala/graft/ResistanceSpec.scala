package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.algo.HittingTime
import graft.graph.GraphOps

/** Effective resistance vs the series/parallel closed forms. */
class ResistanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r(edges: Seq[(Long, Long)], a: Long, b: Long,
                iters: Int = 60): (Double, Double) = {
    val df = edges.toDF("src", "dst")
    val row = HittingTime.effectiveResistance(spark,
      GraphOps.symmetrize(df), a, b, iters, numPartitions = 2).head()
    (row.getDouble(2), row.getDouble(3))
  }

  test("series: path 0-1-2 has R(0,2) = 2") {
    val (i, reff) = r(Seq((0L, 1L), (1L, 2L)), 0L, 2L)
    assert(i === 0.5 && reff === 2.0)
  }

  test("parallel: C4 has R(0,2) = 1 (two series-2 branches)") {
    val (_, reff) = r(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), 0L, 2L)
    assert(reff === 1.0)
  }

  test("triangle edge: R = 2/3 (direct edge parallel with a 2-path)") {
    val (i, reff) = r(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 0L, 1L)
    assert(i === 1.5 && reff === 0.666667)
  }

  test("monotone lower bound tightens with sweeps") {
    // longer path: convergence is geometric; few sweeps underestimate R
    // (overestimate I), more sweeps approach the exact series value 4
    val p5 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val (_, r10) = r(p5, 0L, 4L, iters = 10)
    val (_, r80) = r(p5, 0L, 4L, iters = 80)
    assert(r10 <= r80 + 1e-9)
    assert(math.abs(r80 - 4.0) < 1e-4)
  }
}

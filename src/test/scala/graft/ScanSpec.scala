package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, Scan}

/** SCAN structural clustering on hand-checkable fixtures: the textbook
  * two-triangles-with-a-bridge graph exercises every role (core, hub,
  * outlier), a clique-with-pendant exercises the border role, and a
  * permuted-id rerun checks label canonicalization (cluster = min
  * member id). Every expected σ value was computed by hand with the
  * closed-neighborhood formula σ(u,v) = (common+2)/√((du+1)(dv+1)).
  */
class ScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(e: (Long, Long)*): DataFrame =
    GraphOps.symmetrize(e.toDF("src", "dst"))

  private def collect(df: DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  // two triangles {1,2,3} and {5,6,7}, bridge 4 between them, pendant
  // 8 off vertex 1.  At ε = 18/25 = 0.72 the intra-triangle σ values
  // (0.75–1.0) pass, the bridge σ (0.577) and pendant σ (0.707) fail.
  test("two triangles with a bridge: cores, hub and outlier") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L), (5L, 7L),
      (6L, 7L), (3L, 4L), (4L, 5L), (1L, 8L))
    val out = collect(Scan.run(spark, g, epsNum = 18, epsDenom = 25, mu = 3,
      numPartitions = 4))
    assert(out == Map(
      1L -> ((1L, "core")), 2L -> ((1L, "core")), 3L -> ((1L, "core")),
      5L -> ((5L, "core")), 6L -> ((5L, "core")), 7L -> ((5L, "core")),
      4L -> ((-1L, "hub")), 8L -> ((-1L, "outlier"))))
  }

  // 4-clique {10..13} with pendant 14 on 10: σ(10,14) = 2/√10 ≈ 0.632
  // passes ε = 3/5 but 14 has only 2 ε-neighbors (self + 10) < μ = 3,
  // so it is a border of the clique's cluster, not a core.
  test("clique with a pendant: border attaches to the adjacent cluster") {
    val g = edges((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L), (10L, 14L))
    val out = collect(Scan.run(spark, g, epsNum = 3, epsDenom = 5, mu = 3,
      numPartitions = 4))
    assert(out == Map(
      10L -> ((10L, "core")), 11L -> ((10L, "core")),
      12L -> ((10L, "core")), 13L -> ((10L, "core")),
      14L -> ((10L, "border"))))
  }

  // same clique graph under an id permutation: roles are preserved and
  // the cluster label is the minimum member id of the permuted graph
  test("cluster labels canonicalize to the min member id") {
    val g = edges((40L, 31L), (40L, 22L), (40L, 13L), (31L, 22L),
      (31L, 13L), (22L, 13L), (40L, 4L))
    val out = collect(Scan.run(spark, g, epsNum = 3, epsDenom = 5, mu = 3,
      numPartitions = 4))
    assert(out == Map(
      40L -> ((13L, "core")), 31L -> ((13L, "core")),
      22L -> ((13L, "core")), 13L -> ((13L, "core")),
      4L -> ((13L, "border"))))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{Scc, Topology}

/** Kahn layering invariants: longest-path layers on hand graphs,
  * cycle rejection, isolated-vertex entry, and the condensation
  * composition (cyclic graph → SCC → layered DAG).
  */
class TopologySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def layersOf(edges: Seq[(Long, Long)],
               vertices: Option[Seq[Long]] = None): Map[Long, Long] =
    Topology.layers(spark, edges.toDF("src", "dst"),
        vertices.map(_.toDF("id")), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diamond with a skip edge: layer = longest path from a source") {
    // 0→1→3, 0→2→3, plus skip 0→3: 3 still sits at layer 2
    val l = layersOf(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (0L, 3L)))
    assert(l == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("two chains of different length joining: max wins") {
    // 0→1→2→5 and 3→4→5: 5 takes the longer chain's depth
    val l = layersOf(Seq((0L, 1L), (1L, 2L), (2L, 5L), (3L, 4L), (4L, 5L)))
    assert(l(5L) == 3L && l(4L) == 1L && l(3L) == 0L)
  }

  test("isolated vertices land in layer 0") {
    val l = layersOf(Seq((0L, 1L)), Some(Seq(0L, 1L, 7L, 8L)))
    assert(l == Map(0L -> 0L, 1L -> 1L, 7L -> 0L, 8L -> 0L))
  }

  test("a cycle fails loud instead of returning a partial layering") {
    val ex = intercept[IllegalArgumentException] {
      layersOf(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L)))
    }
    assert(ex.getMessage.contains("not a DAG"))
  }

  test("condensation composition: cyclic graph layers through its SCCs") {
    // 2-cycle {0,1} → 2 → 3, plus 2-cycle {4,5} → 3
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 3L),
      (4L, 5L), (5L, 4L), (5L, 3L)).toDF("src", "dst")
    val scc = Scc.run(spark, edges, numPartitions = 2)
    val cond = Scc.condensation(edges, scc)
      .select(col("csrc").as("src"), col("cdst").as("dst"))
    val l = Topology.layers(spark, cond, numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // components labeled by min member: {0,1}→0, {2}→2, {3}→3, {4,5}→4
    assert(l == Map(0L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 2L))
  }
}

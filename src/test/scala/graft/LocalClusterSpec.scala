package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, LocalCluster}

/** Sweep-cut invariants on a barbell graph (two K4s joined by one
  * bridge): the conductance minimum must be the bridge cut around the
  * seed's K4, with exact integer volume/cut values.
  */
class LocalClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // K4 on 0..3, K4 on 4..7, bridge 3-4
  val barbell: Seq[(Long, Long)] =
    (for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)) ++
    (for (i <- 4 to 7; j <- (i + 1) to 7) yield (i.toLong, j.toLong)) ++
    Seq((3L, 4L))

  test("barbell: conductance bottoms at the seed-side K4 with cut=1") {
    val sym = GraphOps.symmetrize(barbell.toDF("src", "dst"))
    val sweep = LocalCluster.sweepCut(spark, sym,
        Seq(0L).toDF("id"), k = 8, iters = 5, numPartitions = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
      .sortBy(_._1)
    assert(sweep.length == 8)
    assert(sweep.last._5.isNaN, "φ(V) is undefined → NULL")
    val best = sweep.filterNot(_._5.isNaN).minBy(_._5)
    // S_4 = the seed's K4: vol = 3+3+3+4 = 13, cut = the bridge = 1
    assert(best._1 == 4, s"best prefix should be the K4: $sweep")
    assert(best._3 == 13L && best._4 == 1L)
    assert(math.abs(best._5 - math.rint(1e6 / 13.0) / 1e6) < 1e-9)
    assert(sweep.take(4).map(_._2).toSet == Set(0L, 1L, 2L, 3L),
      s"the seed's K4 must fill the first four positions: $sweep")
    // volumes are a strictly increasing exact cumsum
    assert(sweep.map(_._3).toSeq == sweep.map(_._3).sorted.toSeq)
    assert(sweep.last._3 == 26L, "full volume = 2·|E| = 26")
  }

  test("full-graph prefix closes the cut to zero") {
    val sym = GraphOps.symmetrize(barbell.toDF("src", "dst"))
    val sweep = LocalCluster.sweepCut(spark, sym,
        Seq(0L).toDF("id"), k = 8, iters = 5, numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(sweep.last._2 == 0L, "S_8 = V has no boundary")
  }
}

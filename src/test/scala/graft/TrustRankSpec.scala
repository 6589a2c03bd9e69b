package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.TrustRank

/** TrustRank / spam mass: seed-propagation defense signals. */
class TrustRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(rows: (Long, Long)*): DataFrame = rows.toDF("src", "dst")

  test("a spam farm's target carries near-total relative mass") {
    // trusted community 1↔2↔3 (mutually linking), spam farm 10..14 all
    // boosting target 20, which links back to the farm (rank trap)
    val good = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
    val farm = (10L to 14L).flatMap(s => Seq((s, 20L), (20L, s)))
    val e = edges((good ++ farm): _*)
    val trusted = Seq(1L, 2L, 3L).toDF("id")
    val sm = TrustRank.spamMass(spark, e, trusted, numPartitions = 4,
      maxIter = 30)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(4))).toMap
    // the farm component gets NO trusted teleport and no trusted link:
    // its TrustRank is exactly 0 → relative mass 1
    assert(sm(20L)._3 == 1.0)
    assert((10L to 14L).forall(v => sm(v)._3 == 1.0))
    // the trusted triangle concentrates ALL TrustRank mass: trust
    // exceeds global rank, relative mass goes negative
    assert(Seq(1L, 2L, 3L).forall(v => sm(v)._3 < 0.0))
    assert(Seq(1L, 2L, 3L).forall(v => sm(v)._2 > sm(v)._1))
  }

  test("trusting every vertex reduces TrustRank to PageRank exactly") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val all = Seq(1L, 2L, 3L, 4L).toDF("id")
    val sm = TrustRank.spamMass(spark, e, all, numPartitions = 4, maxIter = 8)
    val masses = sm.select("mass").collect().map(_.getDouble(0))
    assert(masses.forall(_ == 0.0))
    val rel = sm.select("rel_mass").collect().map(_.getDouble(0))
    assert(rel.forall(_ == 0.0))
  }

  test("a page linked by trusted pages inherits trust through the walk") {
    // 1 (trusted) → 2 → 3; 3 dangles
    val e = edges((1L, 2L), (2L, 3L))
    val sm = TrustRank.spamMass(spark, e, Seq(1L).toDF("id"),
      numPartitions = 4, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sm(2L) > 0.0 && sm(3L) > 0.0)
    assert(sm(1L) > sm(2L) && sm(2L) > sm(3L))
  }
}

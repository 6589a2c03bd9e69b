package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{DegreeMixing, GraphOps}

/** Directed assortativity (four Newman modes) + knn(k). */
class DegreeMixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def assort(edges: Seq[(Long, Long)]): Map[String, Option[Double]] =
    DegreeMixing.assortativity(spark, edges.toDF("src", "dst"), 4)
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  /** Literal Pearson over edges for one mode. */
  def brute(edges: Seq[(Long, Long)], mode: String): Option[Double] = {
    val es = edges.distinct.filter(e => e._1 != e._2)
    val od = es.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
      .withDefaultValue(0.0)
    val id = es.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
      .withDefaultValue(0.0)
    val xy = es.map { case (u, v) =>
      mode match {
        case "out-in"  => (od(u), id(v))
        case "out-out" => (od(u), od(v))
        case "in-in"   => (id(u), id(v))
        case "in-out"  => (id(u), od(v))
      }
    }
    val m = xy.size.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val dx = m * sxx - sx * sx; val dy = m * syy - sy * sy
    if (dx == 0 || dy == 0) None
    else Some((m * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)))
  }

  test("all four modes match a literal Pearson on seeded digraphs") {
    for (seed <- Seq(2L, 9L)) {
      val edges = (0L until 40L).map { k =>
        ((k * k * seed + k) % 11, (k * seed + 3 * k * k + 2) % 11)
      }
      val got = assort(edges)
      for (mode <- DegreeMixing.Modes) {
        val want = brute(edges, mode)
        (got(mode), want) match {
          case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-6, mode)
          case (None, None)       => ()
          case other              => fail(s"$mode: $other")
        }
      }
    }
  }

  test("uniform out-degree: out-* modes have zero x-variance → null") {
    // every vertex sends exactly one edge
    val edges = (0L until 6L).map(i => (i, (i + 1) % 6)) ++
      Seq((0L, 3L), (1L, 3L)) // give in-degree some variance
    val got = assort(edges.map { case (a, b) => (a, b) })
    // out-degree now varies (0 and 1 send 2) — build a truly uniform one
    val uni = (0L until 6L).map(i => (i, (i + 2) % 6))
    val g2 = assort(uni)
    assert(g2("out-in").isEmpty && g2("out-out").isEmpty)
    assert(got("in-in").isDefined)
  }

  test("knn(k): star center sees degree-1 neighbors and vice versa") {
    val star = GraphOps.symmetrize(
      Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst"))
    val got = DegreeMixing.avgNeighborDegree(spark, star, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(3L) == (1L, 1.0)) // the center: three degree-1 leaves
    assert(got(1L) == (3L, 3.0)) // leaves: one degree-3 center
  }

  test("knn(k) literal check on a mixed graph") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
    val g = GraphOps.symmetrize(es.toDF("src", "dst"))
    val got = DegreeMixing.avgNeighborDegree(spark, g, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // degrees: 1→1, 2→3, 3→2, 4→2
    // k=1: {1}: nbr 2 (deg3) → 3.0
    // k=2: {3,4}: (3+2)/2=2.5 and (3+2)/2=2.5 → 2.5
    // k=3: {2}: (1+2+2)/3 = 5/3
    assert(got(1L) == 3.0)
    assert(got(2L) == 2.5)
    assert(math.abs(got(3L) - 5.0 / 3) < 1e-6)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Mis
import graft.graph.GraphOps

/** MIS invariants (independence, maximality, isolated-vertex entry) and
  * coloring validity (proper coloring, full coverage) on a structured
  * arithmetic graph — the adversarial case for priority scrambles.
  */
class MisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // circulant-ish fixture: arithmetic-progression jumps, degree ~6
  def fixtureEdges(n: Long): DataFrame = {
    val r = spark.range(n).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(10L)) =!= 0)
    def rule(m: Long, c: Long) =
      r.select(col("a").as("src"),
        pmod(col("a") + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(n)).as("dst"))
    rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
      .filter(col("src") =!= col("dst")).distinct()
  }

  test("MIS is independent and maximal on the arithmetic fixture") {
    val sym = GraphOps.symmetrize(fixtureEdges(400L))
    val mis = Mis.run(spark, sym, numPartitions = 4).cache()
    val members = mis.select(col("id"))

    val internal = sym
      .join(members.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(members.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .count()
    assert(internal == 0, s"$internal edges inside the MIS")

    val uncovered = sym.select(col("src").as("id")).distinct()
      .join(members, Seq("id"), "left_anti")
      .join(
        sym.join(members.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .select(col("dst").as("id")).distinct(),
        Seq("id"), "left_anti")
      .count()
    assert(uncovered == 0, s"$uncovered non-members with no MIS neighbor")
    mis.unpersist()
  }

  test("isolated vertices enter the MIS in round 1") {
    val sym = GraphOps.symmetrize(fixtureEdges(200L))
    val verts = spark.range(200L).select(col("id"))
      .unionAll(spark.range(9000L, 9005L).select(col("id")))
    val mis = Mis.run(spark, sym, Some(verts), numPartitions = 4)
    val isolated = mis.filter(col("id") >= 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(isolated.length == 5)
    assert(isolated.forall(_._2 == 1L), s"isolated rounds: ${isolated.toSeq}")
  }

  test("coloring is proper and covers every vertex") {
    val sym = GraphOps.symmetrize(fixtureEdges(400L))
    val colored = Mis.coloring(spark, sym, numPartitions = 4).cache()
    val vertices = sym.select(col("src").as("id")).distinct()
    assert(colored.count() == vertices.count())
    assert(colored.join(vertices, Seq("id"), "left_anti").count() == 0)

    val clash = sym
      .join(colored.withColumnRenamed("id", "src")
        .withColumnRenamed("color", "c_src"), Seq("src"))
      .join(colored.withColumnRenamed("id", "dst")
        .withColumnRenamed("color", "c_dst"), Seq("dst"))
      .filter(col("c_src") === col("c_dst"))
      .count()
    assert(clash == 0, s"$clash monochromatic edges")

    // O(log n) regime on a degree-~6 graph: far below the 118-color
    // degenerate schedule a structured scramble produced
    val maxColor = colored.agg(max(col("color"))).collect()(0).getLong(0)
    assert(maxColor <= 40, s"coloring used $maxColor rounds — scramble degraded")
    colored.unpersist()
  }

  test("MIS is deterministic across runs") {
    val sym = GraphOps.symmetrize(fixtureEdges(300L))
    val a = Mis.run(spark, sym, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Mis.run(spark, sym, numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}

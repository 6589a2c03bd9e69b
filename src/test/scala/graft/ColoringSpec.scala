package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Coloring
import graft.graph.GraphOps

/** Jones–Plassmann coloring vs a sequential synchronous-round
  * reference with the identical (deg, mix, id) priority, plus the
  * properness/palette invariants and the isolated-vertex path.
  */
class ColoringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mixRef(id: Long): Long = ((id % 2147483648L) * 2654435761L) % 2147483648L

  /** Sequential replay of the synchronous schedule. */
  private def refColoring(edges: Seq[(Long, Long)], ids: Seq[Long]): Map[Long, Int] = {
    val nbrs = (edges ++ edges.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val deg = ids.map(v => v -> nbrs.getOrElse(v, Set.empty).size.toLong).toMap
    def buck(v: Long): Long =
      java.lang.Long.toBinaryString(deg(v)).length.toLong - 1
    def prio(v: Long) = (buck(v), mixRef(v), v)
    val color = scala.collection.mutable.Map[Long, Int]()
    val ord = implicitly[Ordering[(Long, Long, Long)]]
    while (color.size < ids.size) {
      val uncol = ids.filterNot(color.contains)
      val winners = uncol.filter { v =>
        nbrs.getOrElse(v, Set.empty).filterNot(color.contains)
          .forall(u => ord.lt(prio(u), prio(v)))
      }
      winners.foreach { v =>
        val used = nbrs.getOrElse(v, Set.empty).flatMap(color.get)
        color(v) = Iterator.from(0).find(c => !used.contains(c)).get
      }
    }
    color.toMap
  }

  private val arithEdges: Seq[(Long, Long)] = {
    // small arithmetic graph in the sql-graph family, 60 vertices
    val v = 60L
    (0L until v).filter(_ % 10 != 0).flatMap { a =>
      Seq((a, (a + 4 * (a % 7 + 1)) % v), (a, (a + 4 * (a % 11 + 3)) % v))
    }.filter(e => e._1 != e._2).distinct
  }

  test("distributed == sequential reference, exact colors") {
    val e = arithEdges.toDF("src", "dst")
    val res = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 4)
    assert(res.converged)
    val got = res.colors.as[(Long, Int)].collect().toMap
    val ids = arithEdges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got === refColoring(arithEdges, ids))
  }

  test("properness and palette bound on a denser graph") {
    val edges = (0L until 200L).flatMap { a =>
      Seq((a, (a * 3 + 7) % 200), (a, (a * 5 + 11) % 200), (a, (a + 1) % 200))
    }.filter(e => e._1 != e._2).distinct
    val e = edges.toDF("src", "dst")
    val sym = GraphOps.symmetrize(e)
    val res = Coloring.run(spark, sym, numPartitions = 8)
    assert(res.converged)
    val bad = sym.join(res.colors.withColumnRenamed("id", "src")
        .withColumnRenamed("color", "c1"), Seq("src"))
      .join(res.colors.withColumnRenamed("id", "dst")
        .withColumnRenamed("color", "c2"), Seq("dst"))
      .filter(col("c1") === col("c2")).count()
    assert(bad === 0L, "monochromatic edge")
    val maxColor = res.colors.agg(max("color")).as[Int].collect().head
    val maxDeg = sym.groupBy("src").count().agg(max("count")).as[Long].collect().head
    assert(maxColor <= maxDeg, s"palette $maxColor exceeds Δ=$maxDeg")
  }

  test("partition-count invariance") {
    val e = arithEdges.toDF("src", "dst")
    val a = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 2)
      .colors.as[(Long, Int)].collect().toMap
    val b = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 16)
      .colors.as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("star: hub colors first with 0, leaves take 1") {
    val e = (1L to 8L).map(i => (0L, i)).toDF("src", "dst")
    val res = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 2)
    val got = res.colors.as[(Long, Int)].collect().toMap
    assert(got(0L) === 0)
    assert((1L to 8L).forall(got(_) === 1))
    assert(res.rounds <= 3)
  }

  test("isolated vertices color 0 via the vertices table") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 99L).toDF("id")
    val res = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 2,
      vertices = Some(verts))
    val got = res.colors.as[(Long, Int)].collect().toMap
    assert(got(99L) === 0)
    assert(Set(got(1L), got(2L)) === Set(0, 1))
  }

  test("checkEvery batching and contraction leave colors bit-identical") {
    val e = arithEdges.toDF("src", "dst")
    val a = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 4)
      .colors.as[(Long, Int)].collect().toMap
    val b = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 4,
      contractEvery = 3, checkEvery = 4)
      .colors.as[(Long, Int)].collect().toMap
    assert(a === b)
  }

  test("maxRounds cap leaves stragglers null, converged=false") {
    val e = (0L until 30L).map(i => (i, (i + 1) % 30)).toDF("src", "dst")
    val res = Coloring.run(spark, GraphOps.symmetrize(e), numPartitions = 2,
      maxRounds = 1)
    assert(!res.converged)
    val withNull = res.colors.filter(col("color").isNull).count()
    assert(withNull > 0)
  }
}

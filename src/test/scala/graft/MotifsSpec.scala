package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Motifs

/** Induced 4-node motif spectrum: the Möbius-inversion constants are
  * verified against literal 4-subset enumeration on hand fixtures and
  * seeded random graphs.
  */
class MotifsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(rows: (Long, Long)*): DataFrame = rows.toDF("src", "dst")

  def induced(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  def subgraphs(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Literal enumeration of every 4-subset, classified by induced
    * edge count + triangle/degree structure.
    */
  def bruteInduced(es: Seq[(Long, Long)]): Map[String, Long] = {
    val und = es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val verts = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    def adj(a: Long, b: Long) = und((math.min(a, b), math.max(a, b)))
    var counts = Map("path4" -> 0L, "claw" -> 0L, "paw" -> 0L,
      "cycle4" -> 0L, "diamond" -> 0L, "clique4" -> 0L)
    for {
      i <- verts.indices; j <- i + 1 until verts.size
      k <- j + 1 until verts.size; l <- k + 1 until verts.size
    } {
      val s = Seq(verts(i), verts(j), verts(k), verts(l))
      val within = for (a <- 0 to 3; b <- a + 1 to 3 if adj(s(a), s(b))) yield (a, b)
      val m = within.size
      val deg = (0 to 3).map(x => within.count(e => e._1 == x || e._2 == x)).sorted
      val hasTriangle = (for {
        a <- 0 to 3; b <- a + 1 to 3; c <- b + 1 to 3
        if adj(s(a), s(b)) && adj(s(a), s(c)) && adj(s(b), s(c))
      } yield 1).nonEmpty
      val motif = m match {
        case 3 if deg == Seq(1, 1, 2, 2) => Some("path4")
        case 3 if deg == Seq(1, 1, 1, 3) => Some("claw")
        case 4 if hasTriangle => Some("paw")
        case 4 => Some("cycle4")
        case 5 => Some("diamond")
        case 6 => Some("clique4")
        case _ => None // m<3 or m=3 triangle+isolate: disconnected
      }
      motif.foreach(name => counts += name -> (counts(name) + 1L))
    }
    counts
  }

  test("hand fixtures: each pure shape reports exactly itself") {
    val cases: Seq[(String, Seq[(Long, Long)])] = Seq(
      "path4" -> Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      "claw" -> Seq((1L, 2L), (1L, 3L), (1L, 4L)),
      "paw" -> Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)),
      "cycle4" -> Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)),
      "diamond" -> Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)),
      "clique4" -> Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    for ((shape, es) <- cases) {
      val got = induced(Motifs.fourNode(spark, edges(es: _*), numPartitions = 4))
      val want = bruteInduced(es)
      assert(got == want, s"fixture $shape")
      assert(got(shape) == 1L && got.values.sum == 1L, s"fixture $shape purity")
    }
  }

  test("K5: closed forms C(5,4)·(motif per K4-subset)") {
    val es = for (a <- 1L to 5L; b <- a + 1 to 5L) yield (a, b)
    val got = induced(Motifs.fourNode(spark, edges(es: _*), numPartitions = 4))
    assert(got == Map("path4" -> 0L, "claw" -> 0L, "paw" -> 0L,
      "cycle4" -> 0L, "diamond" -> 0L, "clique4" -> 5L))
  }

  test("complete bipartite K2,3 is all cycles and claws") {
    val es = for (a <- 1L to 2L; b <- 3L to 5L) yield (a, b)
    val got = Motifs.fourNode(spark, edges(es: _*), numPartitions = 4)
    assert(induced(got) == bruteInduced(es))
    assert(induced(got)("cycle4") == 3L) // choose 1 of C(2,2) × C(3,2)
    assert(induced(got)("claw") == 2L) // centers 1 and 2
  }

  test("matches 4-subset enumeration on seeded random graphs") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 3) {
      val n = 10 + trial * 2
      val es = (for {
        a <- 1L to n; b <- a + 1 to n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val got = Motifs.fourNode(spark, edges(es: _*), numPartitions = 4)
      assert(induced(got) == bruteInduced(es), s"trial $trial (n=$n) induced")
      // independent spot-checks of two subgraph counts
      val und = es.toSet
      def adj(a: Long, b: Long) = und((math.min(a, b), math.max(a, b)))
      val verts = (1L to n).filter(v => es.exists(e => e._1 == v || e._2 == v))
      val path4Brute = (for {
        a <- verts; b <- verts if a != b && adj(a, b)
        c <- verts if c != a && c != b && adj(b, c)
        d <- verts if d != a && d != b && d != c && adj(c, d)
      } yield 1).size / 2
      assert(subgraphs(got)("path4") == path4Brute, s"trial $trial path4 subgraphs")
      val k4Brute = (for {
        a <- verts; b <- verts if a < b && adj(a, b)
        c <- verts if b < c && adj(a, c) && adj(b, c)
        d <- verts if c < d && adj(a, d) && adj(b, d) && adj(c, d)
      } yield 1).size
      assert(subgraphs(got)("clique4") == k4Brute, s"trial $trial clique4")
    }
  }

  test("null-model ratios: claw is the exact-identity sanity row") {
    val es = (for (a <- 1L to 6L; b <- a + 1 to 6L) yield (a, b)) ++
      Seq((6L, 7L), (7L, 8L), (8L, 9L)) // K6 + a tail
    val rows = Motifs.nullModelRatios(spark, edges(es: _*), numPartitions = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    // claw's observed subgraph count IS m3/6 — ratio exactly 1
    assert(rows("claw")._2 == 1.0)
    // a clique concentrates closed shapes far beyond degree chance
    assert(rows("clique4")._2 > 5.0, s"K6 clique4 ratio: ${rows("clique4")}")
    assert(rows("diamond")._2 > 1.0)
  }

  test("triangle-free graph: paw/diamond/clique4 all zero") {
    // 6-cycle
    val es = (1L to 6L).map(i => (i, if (i == 6) 1L else i + 1))
    val got = induced(Motifs.fourNode(spark, edges(es: _*), numPartitions = 4))
    assert(got("paw") == 0L && got("diamond") == 0L && got("clique4") == 0L)
    assert(got == bruteInduced(es))
  }
}

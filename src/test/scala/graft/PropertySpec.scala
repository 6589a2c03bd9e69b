package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{ConnectedComponents, Mis, Mst, PageRank, Triangles}
import graft.functions.IndelRatio
import graft.graph.GraphOps

/** ScalaCheck properties promised in SURVEY.md §5: normalization
  * idempotence, PageRank mass conservation + oracle agreement, CC label
  * = min component id, triangle-count relabeling invariance, indel
  * metric laws. Spark-backed properties run few but adversarial sizes.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic manual sampler (no scalatestplus bridge in the
    * offline cache): draws `n` values from `g` at fixed seeds.
    */
  def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(50),
      org.scalacheck.rng.Seed(i * 7919L)))

  val nameGen: Gen[String] = for {
    n <- Gen.choose(0, 24)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('-', '(', ')', '.', '!', '_'), 1 -> Gen.numChar))
  } yield cs.mkString

  test("property: name normalization is idempotent (norm∘norm = norm)") {
    val names = samples(nameGen, 300)
    assert(names.size > 200)
    val once = names.toDF("name")
      .select(normalize.Normalize.normalizedName(col("name")).as("n"))
    val twice = once.select(normalize.Normalize.normalizedName(col("n")).as("n"))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("property: indel_ratio laws — range, identity, symmetry") {
    val pairs = samples(nameGen, 200).grouped(2).collect { case Seq(a, b) => (a, b) }
    pairs.foreach { case (a, b) =>
      val r = IndelRatio.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(IndelRatio.ratio(a, a) == 100.0)
      assert(math.abs(r - IndelRatio.ratio(b, a)) < 1e-12)
    }
  }

  val edgeListGen: Gen[List[(Long, Long)]] = for {
    v <- Gen.choose(5, 60)
    m <- Gen.choose(4, 150)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, v.toLong - 1)
      b <- Gen.choose(0L, v.toLong - 1)
    } yield (a, b))
  } yield es.filter(e => e._1 != e._2).distinct

  test("property: PageRank mass ≈ 1 and matches the driver oracle (5 random graphs)") {
    val graphs = Seq(11, 23, 37, 41, 59).map { seed =>
      edgeListGen.apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(seed)).get
    }.filter(_.nonEmpty)
    graphs.foreach { edges =>
      val res = PageRank.run(spark, edges.toDF("src", "dst"), 4, tol = 1e-9)
      val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
      val want = Oracles.pageRank(edges, tol = 1e-9)
      want.foreach { case (v, r) => assert(math.abs(got(v) - r) < 1e-6) }
    }
  }

  test("property: CC labels equal min component id (5 random graphs)") {
    val graphs = Seq(3, 17, 29, 43, 71).map { seed =>
      edgeListGen.apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(seed)).get
    }.filter(_.nonEmpty)
    graphs.foreach { edges =>
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val got = ConnectedComponents.run(spark, edges.toDF("src", "dst"), numPartitions = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Oracles.components(edges, verts))
    }
  }

  test("property: MIS is independent and maximal (5 random graphs)") {
    val graphs = Seq(13, 19, 47, 61, 83).map { seed =>
      edgeListGen.apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(seed)).get
    }.filter(_.nonEmpty)
    graphs.foreach { edges =>
      val sym = (edges ++ edges.map(_.swap)).distinct
      val mis = Mis.run(spark, sym.toDF("src", "dst"), numPartitions = 4)
        .collect().map(_.getLong(0)).toSet
      sym.foreach { case (a, b) =>
        assert(!(mis(a) && mis(b)), s"edge ($a,$b) inside the MIS") }
      val verts = sym.map(_._1).toSet
      val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      (verts -- mis).foreach { v =>
        assert(nbrs(v).exists(mis), s"non-member $v has no MIS neighbor") }
    }
  }

  test("property: Boruvka MSF equals Kruskal under (w,u,v) (5 random graphs)") {
    val graphs = Seq(7, 31, 53, 67, 97).map { seed =>
      edgeListGen.apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(seed)).get
    }.filter(_.nonEmpty)
    graphs.foreach { raw =>
      val ew = raw.map { case (a, b) =>
        (math.min(a, b), math.max(a, b), 1L + (a * 7 + b * 13) % 29) }
        .groupBy(e => (e._1, e._2)).map(_._2.minBy(_._3)).toSeq
      val got = Mst.run(spark, ew.toDF("src", "dst", "weight"),
          numPartitions = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(e => (e._3, e._1, e._2)).toSeq
      // Kruskal under the same strict total order
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val want = ew.sortBy(e => (e._3, e._1, e._2)).filter { case (u, v, _) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { parent(ru) = rv; true } else false
      }
      assert(got == want.toSeq)
    }
  }

  test("property: triangle count is invariant under vertex relabeling") {
    val edges = Seq(31, 53).map { seed =>
      edgeListGen.apply(Gen.Parameters.default.withSize(50),
        org.scalacheck.rng.Seed(seed)).get
    }.filter(_.nonEmpty)
    edges.foreach { es =>
      val base = Triangles.countTriangles(spark,
        GraphOps.undirectedPairs(es.toDF("src", "dst")), 4)
      // relabel v → 7919·v + 13 (injective over test range)
      val relabeled = es.map { case (a, b) => (7919L * a + 13L, 7919L * b + 13L) }
      val got = Triangles.countTriangles(spark,
        GraphOps.undirectedPairs(relabeled.toDF("src", "dst")), 4)
      assert(got == base)
      assert(got == Oracles.triangles(es))
    }
  }

  test("property: minhash signature determinism + sensitivity") {
    val texts = samples(Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString), 50)
    texts.foreach { t =>
      def sig(x: String) = functions.MinHashSig.signature(
        org.apache.spark.unsafe.types.UTF8String.fromString(x), 16, 5).toSeq
      assert(sig(t) == sig(t))
      assert(sig(t) != sig(t.reverse + "zzzzz")) // distinct shingle sets
    }
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{LabelPropagation, Triangles}
import graft.graph.GraphOps

/** Weighted label propagation and the global transitivity summary. */
class GraphMetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  def communities(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // two heavy triangles bridged to a satellite: 7 hangs off cluster A
  // by ONE weight-10 edge and off cluster B by TWO weight-1 edges
  private def weightedFixture: DataFrame = {
    val w10 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (7L, 1L)).map { case (u, v) => (u, v, 10L) }
    val w1 = Seq((7L, 4L), (7L, 5L)).map { case (u, v) => (u, v, 1L) }
    (w10 ++ w1).toDF("src", "dst", "w")
  }

  private def symWeighted(df: DataFrame): DataFrame =
    df.unionAll(df.select(col("dst").as("src"), col("src").as("dst"), col("w")))

  test("weighted LPA: one heavy edge out-votes two light ones") {
    val sym = symWeighted(weightedFixture)
    val weighted = communities(LabelPropagation.run(spark, sym,
      numPartitions = 4, maxIter = 10, weightCol = Some("w")).labels)
    // 7 follows its weight-10 anchor into {1,2,3}; {4,5,6} stays its own
    assert(weighted(7L) == 1L)
    assert(Seq(1L, 2L, 3L).forall(weighted(_) == 1L))
    assert(Seq(4L, 5L, 6L).forall(weighted(_) == 4L))

    // unweighted on the same topology: the 2-vs-1 neighbor COUNT plus
    // the tie-to-min cascade merges everything into one community
    val unweighted = communities(LabelPropagation.run(spark, sym,
      numPartitions = 4, maxIter = 10).labels)
    assert(unweighted.values.toSet == Set(1L))
  }

  test("all-ones weights reproduce the unweighted run exactly") {
    val sym = GraphOps.symmetrize(edges((1L, 2L), (2L, 3L), (3L, 4L),
      (4L, 1L), (2L, 4L), (5L, 6L))).withColumn("w", lit(1L))
    val a = communities(LabelPropagation.run(spark, sym,
      numPartitions = 4, maxIter = 5, weightCol = Some("w")).labels)
    val b = communities(LabelPropagation.run(spark, sym,
      numPartitions = 4, maxIter = 5).labels)
    assert(a == b)
  }

  test("transitivity: triangle + pendant = 3 closed of 5 wedges") {
    val pairs = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val row = Triangles.transitivity(spark, pairs, numPartitions = 4).first()
    assert(row.getLong(0) == 5L)   // wedges: 1+1+3+0
    assert(row.getLong(1) == 3L)   // one triangle closes three
    assert(math.abs(row.getDouble(2) - 0.6) < 1e-15)
  }

  test("transitivity: triangle-free graphs and wedge-free graphs") {
    val path = Triangles.transitivity(spark, edges((1L, 2L), (2L, 3L)),
      numPartitions = 4).first()
    assert(path.getLong(1) == 0L && path.getDouble(2) == 0.0)

    val lonePair = Triangles.transitivity(spark, edges((1L, 2L)),
      numPartitions = 4).first()
    assert(lonePair.getLong(0) == 0L && lonePair.isNullAt(2))
  }

  test("transitivity of a clique is 1") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val row = Triangles.transitivity(spark, k4, numPartitions = 4).first()
    assert(row.getDouble(2) == 1.0)
  }

  test("induced sample: exactly the edges between kept vertices, deterministically") {
    val all = (0L until 400L).map(i => (i, (i * 7 + 3) % 400)).filter(p => p._1 != p._2)
    val e = edges(all: _*)
    val sampled = GraphOps.inducedSample(e, num = 1, den = 3, salt = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // replay the predicate driver-side: sample = induced closure
    val kept = spark.range(400)
      .filter(GraphOps.sampleKeep(col("id"), 1, 3, 42L))
      .collect().map(_.longValue).toSet
    val expected = all.filter(p => kept(p._1) && kept(p._2)).toSet
    assert(sampled == expected)
    assert(sampled.nonEmpty && sampled.size < all.size)

    // same parameters reproduce the same subgraph; a new salt moves it
    val again = GraphOps.inducedSample(e, 1, 3, 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == sampled)
    val other = GraphOps.inducedSample(e, 1, 3, 43L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(other != sampled)
  }

  test("induced sample keep-rate tracks num/den") {
    val kept = spark.range(30000)
      .filter(GraphOps.sampleKeep(col("id"), 1, 4, 0L)).count()
    assert(kept > 30000 / 4 * 0.85 && kept < 30000 / 4 * 1.15)
  }

  test("clustering spectrum: K4 + pendant degree classes by hand") {
    val pairs = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val rows = Triangles.clusteringSpectrum(spark, pairs, numPartitions = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // degree-4 class: only vertex 1 (3 triangles): c = 6/12
    assert(rows(4L) == (1L, 3L, 0.5))
    // degree-3 class: the other K4 corners, perfectly clustered
    assert(rows(3L) == (3L, 9L, 1.0))
    // degree-1 pendant excluded
    assert(!rows.contains(1L) && rows.size == 2)
  }

  private def cliqueEdges(base: Long, k: Int): Seq[(Long, Long)] =
    for (i <- 0 until k; j <- i + 1 until k)
      yield (base + i, base + j)

  test("oddball: a planted star center tops the anomaly ranking") {
    // triangle-rich background: 8 disjoint K4s + 8 K5s (clique law
    // E = C(N+1,2) ≈ N²/2); planted near-star hub breaks it hard
    val bg = (0L until 8L).flatMap(i => cliqueEdges(10 * i, 4)) ++
      (0L until 8L).flatMap(i => cliqueEdges(100 + 10 * i, 5))
    val star = (901L to 912L).map(l => (900L, l))
    val rows = Triangles.oddballScores(spark, edges((bg ++ star): _*),
        numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val top = rows.maxBy(_._2)._1
    assert(top == 900L, s"star hub must rank first: top=$top, " +
      s"hub=${rows(900L)}, max-other=${(rows - 900L).values.max}")
    assert(rows(900L) > 10 * (rows - 900L).values.max)
    // degree-1 leaves score exactly 0 (excluded from the pattern)
    assert((901L to 912L).forall(rows(_) == 0.0))
  }

  test("oddball: pure clique mixture fits its own law, no false positives") {
    // K4 and K5 corners are two exact points of E = C(N+1,2): the
    // two-point fit passes through both, residuals vanish
    val bg = (0L until 8L).flatMap(i => cliqueEdges(10 * i, 4)) ++
      (0L until 8L).flatMap(i => cliqueEdges(100 + 10 * i, 5))
    val rows = Triangles.oddballScores(spark, edges(bg: _*), numPartitions = 2)
      .collect().map(r => r.getDouble(3))
    assert(rows.forall(_ < 1e-9))
  }

  test("forman curvature: barbell bridge most negative, clique edges flat") {
    // two K4s joined by a bridge 4–5
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val pairs = edges((k4a ++ k4b :+ (4L, 5L)): _*)
    val rows = Triangles.formanCurvature(spark, pairs, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // bridge: degrees 4 and 4, no triangles → 4 − 4 − 4 + 0 = −4
    assert(rows((4L, 5L)) == (0L, -4L))
    // inner K4 edge (2,3): degrees 3,3, support 2 → 4 − 6 + 6 = 4
    assert(rows((2L, 3L)) == (2L, 4L))
    // the bridge has the strictly lowest curvature in the graph
    val minEdge = rows.minBy(_._2._2)
    assert(minEdge._1 == (4L, 5L))
  }

  test("forman curvature: pendant edge and triangle hand values") {
    // triangle {1,2,3} + pendant 4 on 3
    val rows = Triangles.formanCurvature(spark,
        edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(rows((1L, 2L)) == 4L - 2L - 2L + 3L)   // support 1
    assert(rows((1L, 3L)) == 4L - 2L - 3L + 3L)
    assert(rows((3L, 4L)) == 4L - 3L - 1L)        // support 0
  }

  test("dirichlet: path-graph hand energies, halved global sum") {
    import spark.implicits._
    val feats = Seq((1L, 0L), (2L, 4L), (3L, 4L)).toDF("id", "x")
    val rows = graph.FeatureProp.dirichlet(spark,
        edges((1L, 2L), (2L, 3L)), feats, numPartitions = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(1L) == (1L, 16L, 16.0))
    assert(rows(2L) == (2L, 16L, 8.0))
    assert(rows(3L) == (1L, 0L, 0.0))
    // global Dirichlet energy = sum of local variations / 2
    assert(rows.values.map(_._2).sum / 2 == 16L)
  }

  test("dirichlet: constant signals are energy-free, missing ids are 0") {
    import spark.implicits._
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "x")
    val z = graph.FeatureProp.dirichlet(spark,
      edges((1L, 2L), (2L, 3L)), const, numPartitions = 2)
    assert(z.agg(sum(col("local_var"))).first().getLong(0) == 0L)
    // vertex 3 missing from features → treated as x = 0
    val part = Seq((1L, 5L), (2L, 5L)).toDF("id", "x")
    val rows = graph.FeatureProp.dirichlet(spark,
        edges((1L, 2L), (2L, 3L)), part, numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(3L) == 25L && rows(2L) == 25L && rows(1L) == 0L)
  }

  test("ego features: K4 + pendant hand values, E_ego = d + T") {
    val pairs = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L))
    val rows = Triangles.egoNetFeatures(spark, pairs, numPartitions = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 1's ego-net IS the whole graph: 5 vertices, 7 edges
    assert(rows(1L) == (4L, 7L, 2.0 * 7 / (5 * 4)))
    // a K4 corner's ego-net is K4 itself — perfect near-clique
    assert(rows(2L) == (3L, 6L, 1.0))
    assert(rows(3L) == rows(2L) && rows(4L) == rows(2L))
    // the pendant's ego-net is a single edge (density 1 trivially)
    assert(rows(5L) == (1L, 1L, 1.0))
  }

  test("ego features: near-clique vs near-star density split") {
    val star = Triangles.egoNetFeatures(spark,
      edges((10L, 11L), (10L, 12L), (10L, 13L)), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // star center: E_ego = N − 1 → density 0.5 at d = 3, falling as
    // 2/(d+1) with degree — the OddBall near-star signature
    assert(star(10L) == 0.5)
    val k4 = Triangles.egoNetFeatures(spark,
      edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)),
      numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(k4(_) == 1.0))
  }
}

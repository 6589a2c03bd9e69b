package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{ConnectedComponents, LabelPropagation, Leiden, Louvain, Modularity, ModularityRefine, PageRank, Triangles}
import graft.graph.GraphOps

/** The reference's own community fixtures as exact golden outputs for
  * all four algorithms: two-triangle graph (tests/test_community.py:55-84)
  * and K3 (:86-103); see /root/repo/FIXTURES.md §2-3.
  */
class AlgoFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two disjoint triangles, name-keyed like the reference export
  val twoTriNames: Seq[(String, String)] = Seq(
    ("traceability", "scope creep"),
    ("traceability", "requirements elicitation"),
    ("scope creep", "requirements elicitation"),
    ("iso 26262", "automotive"),
    ("iso 26262", "functional safety"),
    ("automotive", "functional safety"))

  def nameEdges(pairs: Seq[(String, String)]): DataFrame =
    pairs.toDF("a", "b").select(
      xxhash64(col("a")).as("src"), xxhash64(col("b")).as("dst"))

  def idsOf(pairs: Seq[(String, String)]): Map[String, Long] = {
    val names = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    names.toDF("n").select(col("n"), xxhash64(col("n")).as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("two-triangle fixture: PageRank uniform 1/6, allclose 1e-6") {
    val sym = GraphOps.symmetrize(nameEdges(twoTriNames))
    val res = PageRank.run(spark, sym, numPartitions = 4)
    assert(res.converged)
    val ranks = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 6)
    ranks.values.foreach(v => assert(math.abs(v - 1.0 / 6) < 1e-6, s"rank $v"))
  }

  test("two-triangle fixture: 2 components, labels = min member id") {
    val edges = nameEdges(twoTriNames)
    val cc = ConnectedComponents.run(spark, edges, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = idsOf(twoTriNames)
    val t1 = Seq("traceability", "scope creep", "requirements elicitation").map(ids)
    val t2 = Seq("iso 26262", "automotive", "functional safety").map(ids)
    assert(cc.size == 6)
    t1.foreach(v => assert(cc(v) == t1.min))
    t2.foreach(v => assert(cc(v) == t2.min))
    assert(cc.values.toSet.size == 2)
  }

  test("two-triangle fixture: LPA finds 2 communities, all 6 assigned") {
    val sym = GraphOps.symmetrize(nameEdges(twoTriNames))
    val res = LabelPropagation.run(spark, sym, numPartitions = 4)
    assert(res.converged)
    val labs = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size == 6)
    val ids = idsOf(twoTriNames)
    val t1 = Seq("traceability", "scope creep", "requirements elicitation").map(ids)
    val t2 = Seq("iso 26262", "automotive", "functional safety").map(ids)
    assert(t1.map(labs).toSet.size == 1)
    assert(t2.map(labs).toSet.size == 1)
    assert(labs.values.toSet.size == 2)
    // canonical form: community id = min member vertex id
    assert(labs(t1.head) == t1.min && labs(t2.head) == t2.min)
  }

  test("two-triangle fixture: exactly 2 triangles; modularity = 0.5") {
    val pairs = GraphOps.undirectedPairs(nameEdges(twoTriNames))
    assert(Triangles.countTriangles(spark, pairs, 4) == 2L)
    // perfect 2-community split of two disjoint triangles:
    // Q = Σ_c [3/6 - (6/12)²] = 2*(0.5 - 0.25) = 0.5 (leidenalg value)
    val comms = ConnectedComponents.run(spark, nameEdges(twoTriNames), numPartitions = 4)
      .withColumnRenamed("component", "community")
    assert(math.abs(Modularity.modularity(pairs, comms) - 0.5) < 1e-9)
  }

  test("K3 fixture: 1 component, 1 community, 1 triangle, PageRank 1/3") {
    val k3 = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    val edges = nameEdges(k3)
    val sym = GraphOps.symmetrize(edges)

    val pr = PageRank.run(spark, sym, numPartitions = 4)
    pr.ranks.collect().foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-6))

    val cc = ConnectedComponents.run(spark, edges, numPartitions = 4).collect()
    assert(cc.map(_.getLong(1)).toSet.size == 1)

    val lpa = LabelPropagation.run(spark, sym, numPartitions = 4)
    assert(lpa.labels.collect().map(_.getLong(1)).toSet.size == 1)

    assert(Triangles.countTriangles(spark, GraphOps.undirectedPairs(edges), 4) == 1L)
  }

  test("LPA vertices param: isolated vertex gets a self-community (VERDICT r2 #9)") {
    val sym = GraphOps.symmetrize(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val verts = Seq(1L, 2L, 3L, 99L).toDF("id") // 99 has no incident edge
    val res = LabelPropagation.run(spark, sym, numPartitions = 4,
      vertices = Some(verts))
    val labs = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs.size == 4)
    assert(labs(99L) == 99L) // reference assigns every named node
    assert(Seq(1L, 2L, 3L).map(labs).toSet == Set(1L))
    // without the vertex table, only edge endpoints are labeled
    val bare = LabelPropagation.run(spark, sym, numPartitions = 4)
      .labels.collect().map(_.getLong(0)).toSet
    assert(bare == Set(1L, 2L, 3L))
  }

  test("directed random graph: PageRank matches driver oracle, allclose 1e-6") {
    // deterministic pseudo-random digraph: 120 vertices, 480 edges
    val edges = (0 until 480).map { i =>
      val u = (i * 37 + 11) % 120
      val v = (u + 1 + (i * i * 17 + 5) % 97) % 120
      (u.toLong, v.toLong)
    }.distinct.filter(e => e._1 != e._2)
    val df = edges.toDF("src", "dst")
    val res = PageRank.run(spark, df, numPartitions = 4, tol = 1e-9)
    assert(res.converged)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracles.pageRank(edges, tol = 1e-9)
    assert(got.keySet == want.keySet)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    want.foreach { case (v, r) => assert(math.abs(got(v) - r) < 1e-6, s"vertex $v") }
  }

  test("random graph: components match union-find; triangles match brute force") {
    val edges = (0 until 300).map { i =>
      val u = (i * 53 + 7) % 200
      val v = (i * 29 + 3) % 200
      (u.toLong, v.toLong)
    }.filter(e => e._1 != e._2).distinct
    val verts = (0L until 200L)
    val df = edges.toDF("src", "dst")

    val got = ConnectedComponents.run(spark, df,
      vertices = Some(verts.toDF("id")), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Oracles.components(edges, verts)
    assert(got == want)

    val pairs = GraphOps.undirectedPairs(df)
    assert(Triangles.countTriangles(spark, pairs, 4) == Oracles.triangles(edges))
  }

  test("weighted PageRank: equal weights ≡ unweighted; weights steer mass") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val base = PageRank.run(spark, edges, 4).ranks
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // all weights equal → identical ranks
    val eq = PageRank.run(spark,
      edges.withColumn("weight", lit(7.0)), 4, weighted = true).ranks
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    base.foreach { case (id, r) => assert(math.abs(eq(id) - r) < 1e-12) }

    // 1→2 weight 3, 1→3 weight 1: vertex 2 receives 3/4 of 1's mass
    val wEdges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "weight")
    val w = PageRank.run(spark, wEdges, 4, weighted = true)
    val ranks = w.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.converged)
    assert(ranks(2L) > ranks(3L))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // stationary check: r2 = 0.05 + 0.85·(3/4)·r1 within tolerance
    assert(math.abs(ranks(2L) - (0.05 + 0.85 * 0.75 * ranks(1L))) < 1e-5)
  }

  test("PageRank handles dangling vertices (sinks) and keeps sum = 1") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 3L)) // 3 is a sink
    val res = PageRank.run(spark, edges.toDF("src", "dst"), numPartitions = 2)
    assert(res.converged)
    val got = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Oracles.pageRank(edges)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    want.foreach { case (v, r) => assert(math.abs(got(v) - r) < 1e-6) }
  }

  test("ModularityRefine: misassigned vertex moves home, modularity rises") {
    // two 4-cliques {0..3} and {4..7} joined by the bridge 3-4; vertex 0
    // starts misassigned to the right clique's community
    val cliques = for {
      lo <- Seq(0L, 4L); i <- lo until lo + 4; j <- (i + 1) until lo + 4
    } yield (i, j)
    val und = (cliques :+ (3L, 4L)).toDF("src", "dst")
    val sym = GraphOps.symmetrize(und)
    val bad = (0L to 7L).map(i => (i, if (i == 0L || i >= 4L) 4L else 1L))
      .toDF("id", "community")
    val res = ModularityRefine.run(spark, sym, bad, numPartitions = 4)
    assert(res.converged)
    val got = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ideal partition: each clique one community (canonical min member id)
    assert((0L to 3L).forall(got(_) == 0L), s"left clique wrong: $got")
    assert((4L to 7L).forall(got(_) == 4L), s"right clique wrong: $got")
    val q0 = Modularity.modularity(und, bad)
    val q1 = Modularity.modularity(und, res.labels)
    assert(q1 > q0, s"modularity did not rise: $q0 -> $q1")
  }

  test("ModularityRefine: same-parity pair merges (id-parity gate regression)") {
    // single edge 0–2: under the old id-parity gate both endpoints moved
    // in the same (even) round and swapped singleton communities forever —
    // never merging. Direction gating admits only vertex 2's downward
    // move, so one round merges them and the next two go still.
    val und = Seq((0L, 2L)).toDF("src", "dst")
    val res = ModularityRefine.run(spark, GraphOps.symmetrize(und),
      Seq((0L, 0L), (2L, 2L)).toDF("id", "community"), numPartitions = 2)
    assert(res.converged, "even-even pair must converge, not oscillate")
    val got = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 2L -> 0L), s"pair did not merge: $got")
  }

  test("Louvain: ring of cliques resolves to one community per clique") {
    // 4 cliques of 5, ring-linked by single bridges between the cliques'
    // first vertices — small enough that the resolution limit does NOT
    // merge adjacent cliques, so the clique partition is optimal
    val k = 5; val c = 4
    val cliqueEdges = for {
      ci <- 0 until c; i <- 0 until k; j <- (i + 1) until k
    } yield ((ci * k + i).toLong, (ci * k + j).toLong)
    val bridges = (0 until c).map(ci =>
      ((ci * k).toLong, (((ci + 1) % c) * k).toLong))
    val und = (cliqueEdges ++ bridges).toDF("src", "dst")
    val res = Louvain.run(spark, GraphOps.symmetrize(und), 4,
      maxLevels = 3, roundsPerLevel = 4)
    assert(res.levels >= 1)
    val got = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (ci <- 0 until c; i <- 0 until k)
      assert(got((ci * k + i).toLong) == (ci * k).toLong,
        s"clique $ci not canonical: $got")
    // and it scores at least the planted clique partition
    val planted = (0 until c * k).map(v => (v.toLong, (v / k * k).toLong))
      .toDF("id", "community")
    assert(Modularity.modularity(und, res.labels) >=
      Modularity.modularity(und, planted) - 1e-9)
  }

  test("Louvain: partitioning-invariant, isolated vertex keeps self-community") {
    val k = 4; val c = 3
    val cliqueEdges = for {
      ci <- 0 until c; i <- 0 until k; j <- (i + 1) until k
    } yield ((ci * k + i).toLong, (ci * k + j).toLong)
    val und = cliqueEdges.toDF("src", "dst")
    val sym = GraphOps.symmetrize(und)
    val a = Louvain.run(spark, sym, 4).labels
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Louvain.run(spark, sym.repartition(13), 13).labels
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, "Louvain result depends on partitioning")
    val verts = (0L until (c * k + 1).toLong).toDF("id") // +1 isolated
    val withIso = Louvain.run(spark, sym, 4, vertices = Some(verts)).labels
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(withIso((c * k).toLong) == (c * k).toLong)
    assert(withIso.size == c * k + 1)
  }

  test("Leiden split: a planted disconnected community separates into its parts") {
    // two 3-cliques share community 0 but have no connecting edge
    val cl = Seq((0L, 1L), (1L, 2L), (0L, 2L), (10L, 11L), (11L, 12L), (10L, 12L))
    val sym = GraphOps.symmetrize(cl.toDF("src", "dst"))
    val bad = Seq(0L, 1L, 2L, 10L, 11L, 12L).map((_, 0L)).toDF("id", "community")
    val got = Louvain.splitDisconnected(spark, sym, bad, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(got(_) == 0L), got.toString)
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L), got.toString)
  }

  test("Leiden: every output community is internally connected; cliques exact") {
    // skewed deterministic graph — the guarantee must hold regardless
    val edges = (0L until 400L).map { i =>
      val u = (i * i * 31 + i) % 97
      val v = (i * 17 + 5) % 97
      (u, v)
    }.filter { case (u, v) => u != v }
    val sym = GraphOps.symmetrize(edges.toDF("src", "dst"))
    val res = Leiden.run(spark, sym, 4)
    val lab = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = edges.map { case (u, v) => (math.min(u, v), math.max(u, v)) }.distinct
    // driver-side union-find within each community
    val parent = scala.collection.mutable.Map(lab.keys.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    und.foreach { case (u, v) =>
      if (lab(u) == lab(v)) parent(find(u)) = find(v)
    }
    lab.groupBy(_._2).foreach { case (c, members) =>
      val roots = members.keys.map(find).toSet
      assert(roots.size == 1, s"community $c is disconnected: ${members.keys}")
    }
    // and the clique fixture resolves exactly, as with Louvain
    val k = 5; val c = 4
    val cliqueEdges = for {
      ci <- 0 until c; i <- 0 until k; j <- (i + 1) until k
    } yield ((ci * k + i).toLong, (ci * k + j).toLong)
    val bridges = (0 until c).map(ci =>
      ((ci * k).toLong, (((ci + 1) % c) * k).toLong))
    val ring = GraphOps.symmetrize((cliqueEdges ++ bridges).toDF("src", "dst"))
    val lr = Leiden.run(spark, ring, 4, maxLevels = 3, roundsPerLevel = 4)
    val gotR = lr.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (ci <- 0 until c; i <- 0 until k)
      assert(gotR((ci * k + i).toLong) == (ci * k).toLong)
  }

  test("ModularityRefine: already-optimal partition is a fixed point") {
    val tri = GraphOps.symmetrize(nameEdges(twoTriNames))
    val lpa = LabelPropagation.run(spark, tri, numPartitions = 4).labels
    val ref = ModularityRefine.run(spark, tri, lpa, numPartitions = 4)
    assert(ref.converged)
    val before = lpa.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val after = ref.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "refinement changed an optimal 2-triangle split")
  }

  test("personalized PageRank: seeded triangle keeps all mass, the other gets none") {
    // two disjoint triangles; seeds = one triangle's vertices. With no
    // path and no teleport to the other triangle, its PPR is exactly 0
    // and the seeded triangle's symmetric stationary ranks are 1/3.
    val sym = GraphOps.symmetrize(nameEdges(twoTriNames))
    val ids = idsOf(twoTriNames)
    val seedNames = Seq("traceability", "scope creep", "requirements elicitation")
    val seeds = seedNames.map(ids).toDF("id")
    val res = PageRank.run(spark, sym, numPartitions = 4, seeds = Some(seeds))
    assert(res.converged)
    val ranks = res.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    seedNames.foreach(nm =>
      assert(math.abs(ranks(ids(nm)) - 1.0 / 3) < 1e-6, s"$nm: ${ranks(ids(nm))}"))
    Seq("iso 26262", "automotive", "functional safety").foreach(nm =>
      assert(ranks(ids(nm)) == 0.0, s"unseeded $nm got mass: ${ranks(ids(nm))}"))
  }

  test("KCore: K4 plus a dangling path — the clique survives k=3, the tail peels") {
    // K4 on {0,1,2,3}; path 3-10-11-12 hangs off it. At k=3 the path
    // peels back over three rounds (12, then 11, then 10) and the
    // clique remains with in-core degree exactly 3.
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val und = (k4 ++ Seq((3L, 10L), (10L, 11L), (11L, 12L))).toDF("src", "dst")
    val got = graft.algo.KCore.run(spark, GraphOps.symmetrize(und), k = 3,
      numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $got")
    // k above the max coreness → empty core
    assert(graft.algo.KCore.run(spark, GraphOps.symmetrize(und), k = 4,
      numPartitions = 4).count() == 0)
  }

  test("KTruss: K4 edges survive up to k=4 with support 2, the tail peels") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val und = (k4 ++ Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
    val sym = GraphOps.symmetrize(und)
    // 3-truss: every K4 edge sits in 2 triangles; the tail has none
    val t3 = graft.algo.KTruss.run(spark, sym, k = 3, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3 == k4.map(e => e -> 2L).toMap, s"got $t3")
    // K4 is exactly a 4-truss (support ≥ 2) but not a 5-truss
    assert(graft.algo.KTruss.run(spark, sym, k = 4, numPartitions = 4)
      .count() == 6)
    assert(graft.algo.KTruss.run(spark, sym, k = 5, numPartitions = 4)
      .count() == 0)
  }

  test("ShortestPaths: path + disjoint component, two landmarks exact") {
    // path 0-1-2-3 plus a disjoint edge 10-11
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = graft.algo.ShortestPaths
      .run(spark, GraphOps.symmetrize(und), landmarks = Seq(0L, 3L),
        numPartitions = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (2L, 0L) -> 2L, (3L, 0L) -> 3L,
      (3L, 3L) -> 0L, (2L, 3L) -> 1L, (1L, 3L) -> 2L, (0L, 3L) -> 3L)
    assert(got == want) // 10/11 unreachable → absent, no +inf rows
  }

  test("nearestLandmark: Voronoi cells, min-landmark tie-break, absent unreachable") {
    // path 0-1-2-3 plus a disjoint edge 10-11
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = graft.algo.ShortestPaths
      .nearestLandmark(spark, GraphOps.symmetrize(und),
        landmarks = Seq(0L, 3L), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      0L -> (0L, 0L), 1L -> (0L, 1L), // 1 is 1 hop from 0, 2 from 3
      2L -> (3L, 1L), 3L -> (3L, 0L)))  // 10/11 unreachable → absent
    // equidistant vertex goes to the smaller landmark id
    val tie = graft.algo.ShortestPaths
      .nearestLandmark(spark,
        GraphOps.symmetrize(Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")),
        landmarks = Seq(2L, 0L), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tie(1L) == 0L)
  }

  test("distanceDistribution + effectiveDiameter: P4 hand curve") {
    // path 1-2-3-4, landmark 1: distances 0,1,2,3, one vertex each
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val curve = graft.algo.ShortestPaths
      .distanceDistribution(spark, GraphOps.symmetrize(und),
        landmarks = Seq(1L), numPartitions = 4)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(curve == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L), (3L, 1L, 4L)))
    val nf = curve.map(c => (c._1, c._3))
    // target 3.6 falls between nf(2)=3 and nf(3)=4 → 2.6
    assert(graft.algo.ShortestPaths.effectiveDiameter(nf, 0.9) == 2.6)
    assert(graft.algo.ShortestPaths.effectiveDiameter(nf, 1.0) == 3.0)
    // a target inside the first bucket returns the head radius
    assert(graft.algo.ShortestPaths.effectiveDiameter(nf, 0.1) == 0.0)
    // two symmetric landmarks double every count
    val both = graft.algo.ShortestPaths
      .distanceDistribution(spark, GraphOps.symmetrize(und),
        landmarks = Seq(1L, 4L), numPartitions = 4)
      .orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(both == Seq((0L, 2L), (1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("Hyperball: path + disjoint edge, geometric centralities exact below k") {
    // path 0-1-2-3 plus a disjoint edge 10-11; k=64 > every ball → exact
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val res = graft.algo.Hyperball
      .run(spark, GraphOps.symmetrize(und), k = 64, numPartitions = 4)
    val got = res.perVertex.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got(0L) == ((4.0, 6.0, 1.0 + 0.5 + 1.0 / 3))) // dists 1,2,3
    assert(got(1L) == ((4.0, 4.0, 1.0 + 1.0 + 0.5)))     // dists 1,1,2
    assert(got(10L) == ((2.0, 1.0, 1.0)))                // the pair only
    // per-vertex eccentricity: path ends see 3 hops, middles 2, pair 1
    val ecc = res.perVertex.collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(ecc == Map(0L -> 3L, 1L -> 2L, 2L -> 2L, 3L -> 3L,
      10L -> 1L, 11L -> 1L))
    // global neighborhood function: pairs within radius 0,1,2,3
    assert(res.nf == Seq(6.0, 14.0, 18.0, 20.0))
    // 90% of 20 pairs = 18, hit exactly at radius 2
    assert(res.effectiveDiameter(0.9) == 2.0)
    assert(res.effectiveDiameter(1.0) == 3.0)
  }

  test("Hyperball: saturated sketch still estimates the clique ball") {
    // K20: true ball = 20 everywhere; k=8 saturates → (k-1)/u_(k)
    val k20 = (for (i <- 0L until 20L; j <- (i + 1) until 20L) yield (i, j))
      .toDF("src", "dst")
    val est = graft.algo.Hyperball
      .run(spark, GraphOps.symmetrize(k20), k = 8, numPartitions = 4)
      .perVertex.agg(avg(col("nf"))).collect()(0).getDouble(0)
    // ±1/√(k−2) ≈ 41% per vertex, tighter after averaging 20 sketches
    assert(est > 10.0 && est < 40.0, s"mean estimate $est vs true 20")
  }

  test("Triangles.clustering: K4 with tail, hand-computed coefficients") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val und = (k4 ++ Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
    val got = Triangles.clustering(spark, und, numPartitions = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(0L) == ((3L, 3L, 1.0)))  // pure K4 corner
    assert(got(3L) == ((4L, 3L, 0.5)))  // 2*3/(4*3)
    assert(got(10L) == ((2L, 0L, 0.0))) // path vertex, no triangle
    assert(got(11L) == ((1L, 0L, 0.0))) // leaf: degree < 2
  }

  test("ShortestPaths.weighted: longer-hop cheaper path wins (relaxation)") {
    // 0->1 (5), 1->2 (1), 0->2 (10): best 0->2 is 6 via two hops —
    // the pair settles at 10 in round 1 and must IMPROVE in round 2
    val e = Seq((0L, 1L, 5L), (1L, 2L, 1L), (0L, 2L, 10L))
      .toDF("src", "dst", "weight")
    val got = graft.algo.ShortestPaths
      .weighted(spark, e, landmarks = Seq(0L), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 5L, 2L -> 6L))
  }

  test("SCC: two 2-cycles bridged one-way, same forward color") {
    // 0<->1 -> 2<->3: coloring gives everyone color 0, so the backward
    // pass must cut {2,3} away from root 0 and a second round settles it
    val e = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L), (1L, 2L))
      .toDF("src", "dst")
    val got = graft.algo.Scc.run(spark, e, numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("SCC: cycle with a DAG tail; trim settles the tail") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val got = graft.algo.Scc.run(spark, e, numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 6L))
  }

  test("SCC: pure DAG is all singletons via trim alone") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = graft.algo.Scc.run(spark, e, numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("FeatureProp: path graph 2-layer sums, hand-computed") {
    // path 0-1-2 with f = id+10: s1(1) = 10+12, s2(1) = s1(0)+s1(2) = 11+11
    val sym = GraphOps.symmetrize(Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"))
    val feats = Seq((0L, 10L), (1L, 11L), (2L, 12L)).toDF("id", "f")
    val got = graft.graph.FeatureProp
      .neighborSums(spark, sym, feats, layers = 2, numPartitions = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got(0L) == ((1L, 10L, 11L, 22L, 11.0))) // s2(0) = s1(1) = 22
    assert(got(1L) == ((2L, 11L, 22L, 22L, 11.0)))
    assert(got(2L) == ((1L, 12L, 11L, 22L, 11.0)))
  }

  test("Katz: directed star, hand-computed walk series") {
    // 1,2,3 -> 0: k(leaf) = 1 (no in-edges); k(0) = 1 + 3α (only
    // 1-hop walks exist) at every iteration ≥ 1
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val r = graft.algo.Katz.run(spark, star, numPartitions = 2,
      alpha = 0.1, tol = 1e-12, maxIter = 10)
    assert(r.converged && r.iterations <= 3)
    val got = r.scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(0L) - 1.3) < 1e-12)
    Seq(1L, 2L, 3L).foreach(u => assert(got(u) == 1.0))
  }

  test("Betweenness: P4 all-source exact; C4 split σ dependencies") {
    // path 0-1-2-3, all 4 sources → exact ordered betweenness
    val p4 = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val got = graft.algo.Betweenness
      .run(spark, p4, sources = Seq(0L, 1L, 2L, 3L), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 0.0, 1L -> 4.0, 2L -> 4.0, 3L -> 0.0))

    // 4-cycle, source 0: σ(2)=2, so each of 1,3 carries δ = 1/2
    val c4 = GraphOps.symmetrize(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst"))
    val one = graft.algo.Betweenness
      .run(spark, c4, sources = Seq(0L), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one == Map(1L -> 0.5, 2L -> 0.0, 3L -> 0.5))
  }

  test("LinkScores.recommend: C4 non-edge diagonals, hand-computed") {
    // 4-cycle 0-1-2-3-0: the two diagonals are the only pairs with
    // 2 common neighbors; aa = 2/ln(2), jaccard = 2/(2+2-2) = 1
    val c4 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val got = graph.LinkScores
      .recommend(spark, GraphOps.symmetrize(c4), numPartitions = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set((0L, 2L), (1L, 3L)))
    got.values.foreach { case (common, jac, aa) =>
      assert(common == 2L && jac == 1.0)
      assert(math.abs(aa - 2.0 / math.log(2.0)) < 1e-6)
    }
    // degree cap excludes the hub center: star has no surviving wedge
    val star = GraphOps.symmetrize((1L to 4L).map(i => (0L, i)).toDF("src", "dst"))
    assert(graph.LinkScores
      .recommend(spark, star, numPartitions = 2, minCommon = 1,
        maxCenterDegree = 3).count() == 0)
  }

  test("SCC condensation / reciprocity / degree histogram fixtures") {
    val e = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L), (1L, 2L))
      .toDF("src", "dst")
    val cond = graft.algo.Scc
      .condensation(e, graft.algo.Scc.run(spark, e, numPartitions = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cond.toSeq == Seq((0L, 2L))) // the one cross-SCC bridge

    val rec = GraphOps.reciprocity(e).collect()(0)
    assert(rec.getLong(0) == 5 && rec.getLong(1) == 4) // 2 mutual pairs
    assert(rec.getDouble(2) == 0.8)

    val star = GraphOps.symmetrize((1L to 4L).map(i => (0L, i)).toDF("src", "dst"))
    val hist = GraphOps.degreeHistogram(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(2L -> 1L, 0L -> 4L)) // hub degree 4, leaves 1
  }

  test("HITS: in-star is the exact fixed point (auth 1, hubs 1/sqrt(3))") {
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val got = graft.algo.Hits.run(spark, star, numPartitions = 2, maxIter = 5)
      .scores.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(0L)._1 == 0.0 && got(0L)._2 == 1.0)
    val h = 1.0 / math.sqrt(3.0)
    Seq(1L, 2L, 3L).foreach { u =>
      assert(math.abs(got(u)._1 - h) < 1e-12 && got(u)._2 == 0.0)
    }
  }

  test("HITS: tol-driven convergence flag on complete bipartite 2x2") {
    // hubs {0,1} -> auths {10,11}: fixed point h=a=1/sqrt(2) from iter 1
    val e = Seq((0L, 10L), (0L, 11L), (1L, 10L), (1L, 11L)).toDF("src", "dst")
    val r = graft.algo.Hits.run(spark, e, numPartitions = 2, tol = 1e-9,
      maxIter = 20)
    assert(r.converged && r.iterations <= 3)
    val got = r.scores.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val v = 1.0 / math.sqrt(2.0)
    assert(math.abs(got(0L)._1 - v) < 1e-9 && math.abs(got(10L)._2 - v) < 1e-9)
  }

  test("RandomWalks.biased: matches an independent step-by-step simulator") {
    // C5 plus a chord: has triangles (0,1,2 / 0,2) and far hops
    val raw = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L), (0L, 2L))
    val sym = GraphOps.symmetrize(raw.toDF("src", "dst"))
    val (wRet, wTri, wFar, bigM) = (1, 2, 1, 2)
    val got = graft.graph.RandomWalks
      .biased(spark, sym, (0L to 4L).toDF("id"), walksPerVertex = 2,
        walkLength = 6, wRet = wRet, wTri = wTri, wFar = wFar,
        numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2))
      .toMap

    val P = 2147483647L
    val adj = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    def walk(start: Long, rep: Long): Seq[Long] = {
      var prev = start; var cur = start; var t = 0L; var att = 0L
      val path = scala.collection.mutable.ArrayBuffer(start)
      while (t < 6) {
        val nbrs = adj(cur)
        val rank = ((cur % P) * 31 + (start % P) * 131 + rep * 8191 +
          t * 257 + att * 12289) % P % nbrs.size
        val x = nbrs(rank.toInt)
        val w = if (x == prev) wRet
          else if (und((math.min(prev, x), math.max(prev, x)))) wTri else wFar
        val u = ((cur % P) * 37 + (start % P) * 149 + rep * 4099 +
          t * 263 + att * 12373) % P % bigM
        if (t == 0 || u < w) { path += x; prev = cur; cur = x; t += 1; att = 0 }
        else att += 1
      }
      path.toSeq
    }
    assert(got.size == 10)
    for (s <- 0L to 4L; r <- 0L to 1L)
      assert(got((s, r)) == walk(s, r), s"walk ($s,$r)")
  }

  test("RandomWalks: directed cycle is fully deterministic") {
    // out-degree 1 everywhere → the walk IS the cycle traversal
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val starts = Seq(0L).toDF("id")
    val got = graft.graph.RandomWalks
      .run(spark, cyc, starts, walksPerVertex = 1, walkLength = 5,
        numPartitions = 2)
      .collect()
    assert(got.length == 1)
    assert(got(0).getSeq[Long](2) == Seq(0L, 1L, 2L, 3L, 0L, 1L))
    // overflow-safety: the same walk on hash-ranged vertex ids
    val big = Seq((Long.MaxValue - 3, Long.MinValue + 7),
      (Long.MinValue + 7, Long.MaxValue - 3)).toDF("src", "dst")
    val bw = graft.graph.RandomWalks
      .run(spark, big, Seq(Long.MaxValue - 3).toDF("id"),
        walksPerVertex = 2, walkLength = 4, numPartitions = 2)
      .collect()
    assert(bw.length == 2 && bw.forall(_.getSeq[Long](2).size == 5))
  }

  test("RandomWalks: dead end retires the walk early; walks follow edges") {
    val path = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // directed, 2 a sink
    val starts = Seq(0L, 2L).toDF("id")
    val got = graft.graph.RandomWalks
      .run(spark, path, starts, walksPerVertex = 2, walkLength = 5,
        numPartitions = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(got.size == 4)
    // both walks from 0 march to the sink and stop; from 2 they never move
    assert(got((0L, 0L)) == Seq(0L, 1L, 2L) && got((0L, 1L)) == Seq(0L, 1L, 2L))
    assert(got((2L, 0L)) == Seq(2L) && got((2L, 1L)) == Seq(2L))
  }

  test("skipGramPairs: hand-computed counts, window clipping at walk ends") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("start", LongType), StructField("replica", LongType),
      StructField("path", ArrayType(LongType))))
    val walks = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 0L, Seq(1L, 2L, 3L, 2L)), // repeated vertex 2
        Row(9L, 0L, Seq(9L))),            // singleton: zero pairs
      schema)
    val got = graft.graph.RandomWalks.skipGramPairs(walks, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // positions 1@0 2@1 3@2 2@3; contexts at distance ≤2 per center:
    //   1@0→{2,3}  2@1→{1,3,2}  3@2→{1,2,2}  2@3→{2,3}
    val want = Map(
      (1L, 2L) -> 1L, (1L, 3L) -> 1L,
      (2L, 1L) -> 1L, (2L, 3L) -> 2L, (2L, 2L) -> 2L,
      (3L, 1L) -> 1L, (3L, 2L) -> 2L)
    assert(got == want, s"got $got want $want")
    // total pairs = Σ per-position context counts = 2+3+3+2
    assert(got.values.sum == 10L)
  }

  test("graphSummary: star graph profile, assortativity exactly -1") {
    val star = (1L to 4L).map(i => (0L, i)).toDF("src", "dst")
    val row = GraphOps.graphSummary(GraphOps.symmetrize(star)).collect()(0)
    assert(row.getLong(0) == 5 && row.getLong(1) == 4)   // n_vertices, n_edges
    assert(row.getLong(2) == 1 && row.getLong(3) == 4)   // min/max degree
    assert(row.getDouble(4) == 1.6)                      // 2m/n = 8/5
    assert(row.getDouble(5) == -1.0)                     // perfect hub-leaf
  }

  test("LinkScores: K4-with-tail edge features match hand computation") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val und = (k4 ++ Seq((3L, 10L), (10L, 11L))).toDF("src", "dst")
    val got = graft.graph.LinkScores.edgeScores(spark, GraphOps.symmetrize(und), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // degrees: 0,1,2 → 3; 3 → 4; 10 → 2; 11 → 1
    // edge (0,1): commons {2,3}; jaccard 2/(3+3-2); aa 1/ln3 + 1/ln4
    assert(got((0L, 1L)) ==
      ((2L, 0.5, r6(1 / math.log(3) + 1 / math.log(4)))))
    // edge (0,3): commons {1,2}; jaccard 2/(3+4-2); aa 2/ln3
    assert(got((0L, 3L)) ==
      ((2L, r6(2.0 / 5), r6(2 / math.log(3)))))
    // tail edges: no triangles → all-zero features
    assert(got((3L, 10L)) == ((0L, 0.0, 0.0)))
    assert(got((10L, 11L)) == ((0L, 0.0, 0.0)))
  }

  test("Louvain cleanup releases this run's pinned frames, not the caller's") {
    val mine = spark.range(50).toDF("id").localCheckpoint(true) // caller-owned
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val und = (0L until 12L).map(i => (i, (i + 1) % 12)).toDF("src", "dst")
    val res = Louvain.run(spark, GraphOps.symmetrize(und), 4)
    res.labels.count() // materialize BEFORE cleanup, per the contract
    val pinnedDuring = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinnedDuring.nonEmpty, "expected per-level pinned frames")
    res.cleanup()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after & pinnedDuring).forall(id =>
      !spark.sparkContext.getPersistentRDDs(id).getStorageLevel.useMemory &&
        !spark.sparkContext.getPersistentRDDs(id).getStorageLevel.useDisk),
      s"run-created frames survived cleanup: ${after & pinnedDuring}")
    assert(mine.count() == 50, "caller-owned checkpoint must survive cleanup")
  }

  test("bipartite projection: co-occurrence weights + hub cap") {
    // docs d1..d3 mention entities; d3 is a fanout-4 boilerplate hub
    val inc = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),           // d1 -> {10,11,12}
      (2L, 11L), (2L, 12L),                       // d2 -> {11,12}
      (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L)) // d3: hub, fanout 4
      .toDF("doc", "ent")
    val full = GraphOps.bipartiteProject(inc, "doc", "ent", maxFanout = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (11,12) witnessed by d1,d2,d3; (10,11)/(10,12) by d1,d3; 13 only via d3
    assert(full == Map((10L, 11L) -> 2L, (10L, 12L) -> 2L, (11L, 12L) -> 3L,
      (10L, 13L) -> 1L, (11L, 13L) -> 1L, (12L, 13L) -> 1L))

    val capped = GraphOps.bipartiteProject(inc, "doc", "ent", maxFanout = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // d3 dropped: 13 disappears entirely, shared weights lose d3's witness
    assert(capped == Map((10L, 11L) -> 1L, (10L, 12L) -> 1L, (11L, 12L) -> 2L))
    val stats = GraphOps.bipartiteFanoutStats(inc, "doc", "ent", 3).collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 4L)))
  }

  test("freshCheckpoint resets inherited stats; bare localCheckpoint compounds them") {
    // Spark 4 copies the origin plan's sizeInBytes into localCheckpoint's
    // LogicalRDD; a self-join per round then SQUARES it, so the BigInt's
    // bit-length doubles each round and BigInteger math eats the driver
    // (the Leiden 19-minute planning stall). freshCheckpoint drops the
    // origin stats, capping the chain at the 63-bit default.
    import graft.algo.Superstep
    def round(df: org.apache.spark.sql.DataFrame) =
      df.join(df.select(col("id").as("id2")), col("id") === col("id2"))
        .select(col("id"))
    var bare = spark.range(100).toDF().localCheckpoint(true)
    var fresh = Superstep.freshCheckpoint(spark.range(100).toDF(), eager = true)
    for (_ <- 1 to 8) {
      bare = round(bare).localCheckpoint(true)
      fresh = Superstep.freshCheckpoint(round(fresh), eager = true)
    }
    val bareBits = bare.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    val freshBits = fresh.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(freshBits <= 64, s"fresh chain stats grew: $freshBits bits")
    assert(bareBits > 4 * freshBits,
      s"expected compounding without the reset (got $bareBits vs $freshBits bits)")
  }

  test("seeded label spreading: clamped path ends, min-label tie at the midpoint") {
    import graft.algo.LabelPropagation
    val sym = GraphOps.symmetrize(Seq((0L, 1L), (1L, 2L), (2L, 3L),
      (3L, 4L), (6L, 7L)).toDF("src", "dst"))
    val seeds = Seq((0L, 10L), (4L, 11L)).toDF("id", "label")
    def run(rounds: Int) = LabelPropagation.seeded(spark, sym, seeds,
      rounds, numPartitions = 4).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // round 2: 2 sees one vote for 10 and one for 11 -> tie -> min
    // label; the disjoint edge 6-7 is unreachable from any seed -> null
    assert(run(2) == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 11L,
      4L -> 11L, 6L -> -1L, 7L -> -1L))
    // round 3: synchronous recompute lets the boundary drift — vertex 3
    // now ties between the newly-labeled 2 (10) and the seed 4 (11) and
    // takes the min. The mode is a full recompute, not a freeze.
    assert(run(3)(3L) == 10L)
  }

  test("rectangle count: C4, K4, C5, shared-edge squares, hub cap") {
    import graft.algo.Triangles
    def rect(e: Seq[(Long, Long)], cap: Long = 0) =
      Triangles.countRectangles(spark,
        GraphOps.undirectedPairs(e.toDF("src", "dst")), 4, cap)
    assert(rect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) == 1L) // C4
    assert(rect(for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)) == 3L) // K4
    assert(rect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))) == 0L) // C5
    // two squares sharing edge (3,4)
    assert(rect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (3L, 5L), (5L, 6L), (6L, 4L))) == 2L)
    // capping away the degree-3 centers (3 and 4) loses their cycles
    assert(rect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (3L, 5L), (5L, 6L), (6L, 4L)), cap = 2) == 0L)
  }

  test("weighted s-core: strength peel keeps the evidence-heavy core") {
    import graft.algo.KCore
    // triangle {1,2,3} with weight-2 edges (strength 4 each) plus a
    // weight-1 pendant 9 on vertex 1 (strength 1; lifts 1 to 5)
    val we = Seq((1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L), (1L, 9L, 1L))
      .toDF("src", "dst", "weight")
    val sym = GraphOps.symmetrizeWeighted(we)
    val got = KCore.sCore(spark, sym, s = 4, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pendant dies (1 < 4); the triangle stands at within-core strength 4
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L))
    // s = 6 cascades: nobody reaches 6 once the pendant is gone
    assert(KCore.sCore(spark, sym, s = 6, numPartitions = 4).count() == 0)
  }
}

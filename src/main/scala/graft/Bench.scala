package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, Leiden, Louvain, PageRank, Superstep, Triangles}
import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.graph.GraphOps
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Headline = the north-rule metric: PageRank edges/sec to 1e-6
  * convergence over the synthesized repo-entity edge table, plus
  * end-to-end superstep wall time for each iterative algorithm and the
  * relational/dedup surface on the sf tables. Emits ONE JSON line.
  *
  * Scale knobs:
  *   SPARK_GRAFT_SF_DIR   sf directory (default sf0.1)
  *   SPARK_GRAFT_CPUS     local[N] (default 4)
  *   GRAFT_BENCH_FILES    corpus file count (default 40×documents)
  *   GRAFT_BENCH_REPS     timings per entry, min reported (default 2;
  *                        all raw samples emitted under "runs")
  *   GRAFT_VSCALE         vertex fan-out (default 40 → ~40k distinct
  *                        vertices at the default file count)
  */
object Bench {

  def buildSession(cpus: String): SparkSession = {
    // shuffle + localCheckpoint blocks on tmpfs: /tmp here is spinning-
    // disk-backed and made identical runs vary 2×; on a cluster
    // spark.local.dir is NVMe-local anyway
    val localDir = {
      val d = new java.io.File("/dev/shm/graft-spark-local")
      if (d.isDirectory || d.mkdirs()) d.getAbsolutePath
      else System.getProperty("java.io.tmpdir")
    }
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.local.dir", localDir)
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-JVM local mode: the "executor" heartbeat is in-process,
      // so its only failure mode here is a false positive — this VM's
      // steal + full-GC pauses exceeded the 10s default and killed a
      // 23-minute scaling run at the 160 M-edge size
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Cumulative (steal, total) jiffies from /proc/stat's aggregate cpu
    * line; (0, 0) where unavailable. Sampled around each timed entry so
    * every published number carries the VM noise it was measured under.
    */
  def cpuJiffies(): (Long, Long) =
    try {
      val cols = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
      (cols(7), cols.sum)
    } catch { case _: Throwable => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = buildSession(cpus)
    val P = spark.sparkContext.defaultParallelism

    val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (20L * docN).toString).toLong
    val vScale = sys.env.getOrElse("GRAFT_VSCALE", "40").toInt

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var extra = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // GRAFT_BENCH_REPS: time each entry N times in-process and report
    // the MINIMUM, with every raw sample emitted in the JSON ("runs")
    // so nothing is hidden. Rationale: this sandbox VM shows
    // time-varying CPU steal — identical deterministic jobs swung 3-4×
    // between consecutive runs (BASELINE.md round 3) — and min-of-N of
    // a deterministic job estimates the machine's actual cost where a
    // single sample measures the noisy neighbor. Reps share nothing
    // beyond what one sequential run already shares (JIT, page cache):
    // before each rerun the entry's cleanup evicts any input-keyed
    // caches (e.g. the marker scan) and EVERY persistent RDD the
    // previous rep created is force-freed — Dataset.unpersist alone is
    // a no-op for localCheckpoint-pinned blocks, which would both leak
    // storage across reps and let rep 2 reuse rep 1's materialized
    // intermediates, under-measuring the very job the rep protocol is
    // meant to pin down.
    val reps = math.max(1, sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt)
    val rawRuns = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val stealPct = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    def bench[T](name: String, cleanup: T => Unit = (_: T) => ())(f: => T): T = {
      var out: Option[T] = None
      val gc = new Superstep.CheckpointGC(spark) // pre-entry frames survive
      val samples = (1 to reps).map { _ =>
        out.foreach { o => cleanup(o); gc.close(0) }
        val (s0, j0) = cpuJiffies()
        val (r, dt) = time(f)
        val (s1, j1) = cpuJiffies()
        out = Some(r)
        (dt, if (j1 > j0) 100.0 * (s1 - s0) / (j1 - j0) else -1.0)
      }
      rawRuns += name -> samples.map(_._1)
      stealPct += name -> samples.map(_._2)
      results += name -> samples.map(_._1).min
      out.get
    }

    // ── pipeline: corpus → extract → normalize → graph ──
    // input synthesis timed separately: on a cluster this is the
    // parquet/Iceberg scan of the input table, not engine work
    val c = bench[DataFrame]("corpus_gen", cleanup = _.unpersist()) {
      val c0 = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
        .localCheckpoint(true)
      c0.count(); c0
    }
    val snap = bench[Snapshot]("pipeline_normalize",
      cleanup = s => { Extractor.evictMarkers(c)
        s.entities.unpersist(); s.edges.unpersist() }) {
      val s0 = Snapshot(Extractor.entities(c), Extractor.relationships(c))
      val out = Normalize.fullChain(s0)
      out.entities.count(); out.edges.count()
      out
    }

    val g = bench[GraphOps.GraphTables]("graph_build",
      cleanup = t => { t.vertices.unpersist(); t.edges.unpersist() }) {
      val gt = GraphOps.semanticGraph(snap)
      GraphOps.GraphTables(gt.vertices.localCheckpoint(true), gt.edges.localCheckpoint(true))
    }
    val sym = GraphOps.symmetrize(g.edges).localCheckpoint(true)
    val mEdges = sym.count()

    // ── iterative algorithms (the headline) ──
    val pr = bench[PageRank.Result]("pagerank")(PageRank.run(spark, sym, P))
    extra += "pagerank_iterations" -> pr.iterations.toDouble
    extra += "pagerank_edges" -> mEdges.toDouble
    extra += "pagerank_edges_per_sec" -> mEdges.toDouble * pr.iterations / results("pagerank")

    bench("connected_components")(
      ConnectedComponents.run(spark, g.edges, Some(g.vertices), P).count())

    bench("label_propagation")(LabelPropagation.run(spark, sym, P, maxIter = 10).labels.count())

    // opt-in: louvain has no BASELINE row (new operator, no reference
    // counterpart in the bench set), so it stays out of the default
    // total to keep round-over-round bench comparisons like-for-like;
    // its measured numbers live in BASELINE.md's operator table
    if (sys.env.get("GRAFT_BENCH_LOUVAIN").contains("1")) {
      val lv = bench[Louvain.Result]("louvain") {
        val r = Louvain.run(spark, sym, P); r.labels.count(); r
      }
      extra += "louvain_levels" -> lv.levels.toDouble
      val le = bench[Louvain.Result]("leiden") {
        val r = Leiden.run(spark, sym, P); r.labels.count(); r
      }
      extra += "leiden_levels" -> le.levels.toDouble
    }

    val tri = bench[Long]("triangles")(
      Triangles.countTriangles(spark, GraphOps.undirectedPairs(g.edges), P))
    extra += "triangle_count" -> tri.toDouble

    // opt-in like louvain: the round-3 graph additions have no
    // BASELINE round-1/2 rows, so they stay out of the default total;
    // measured numbers live in BASELINE.md's operator table
    if (sys.env.get("GRAFT_BENCH_GRAPH2").contains("1")) {
      val lms = sym.select(col("src")).distinct().orderBy(col("src"))
        .limit(3).collect().map(_.getLong(0)).toSeq
      bench("sssp_bfs")(
        algo.ShortestPaths.run(spark, sym, lms, P).count())
      val hb = bench[algo.Hyperball.Result]("hyperball")(
        algo.Hyperball.run(spark, sym, k = 64, numPartitions = P))
      extra += "hyperball_rounds" -> (hb.nf.size - 1).toDouble
      extra += "hyperball_eff_diameter" -> hb.effectiveDiameter(0.9)
      bench("scc")(algo.Scc.run(spark, g.edges, P).count())
      bench("hits")(
        algo.Hits.run(spark, g.edges, P, tol = 0.0, maxIter = 10).scores.count())
      bench("random_walks")(
        graph.RandomWalks.run(spark, sym,
          sym.select(col("src").as("id")).distinct(),
          walksPerVertex = 2, walkLength = 8, numPartitions = P).count())
      bench("random_walks_biased")(
        graph.RandomWalks.biased(spark, sym,
          sym.select(col("src").as("id")).distinct(),
          walksPerVertex = 2, walkLength = 8, numPartitions = P).count())
      bench("skipgram_pairs")(
        graph.RandomWalks.skipGramPairs(
          graph.RandomWalks.run(spark, sym,
            sym.select(col("src").as("id")).distinct(),
            walksPerVertex = 2, walkLength = 8, numPartitions = P),
          window = 2).count())
      bench("clustering_coeff")(
        Triangles.clustering(spark, GraphOps.undirectedPairs(g.edges), P).count())
      bench("coreness")(
        algo.Coreness.run(spark, sym, numPartitions = P).count())
      bench("trussness")(
        algo.Trussness.run(spark, sym, numPartitions = P).count())
      bench("densest")(
        algo.Densest.run(spark, sym, numPartitions = P).members.count())
      bench("scan_cluster")(
        graph.Scan.run(spark, sym, epsNum = 2, epsDenom = 5, mu = 3,
          numPartitions = P).count())
      bench("betweenness")(
        algo.Betweenness.run(spark, sym, lms, P).count())
      bench("katz")(
        algo.Katz.run(spark, g.edges, P, tol = 0.0, maxIter = 10).scores.count())
      bench("recommend")(
        graph.LinkScores.recommend(spark, sym, P, minCommon = 2).count())
      bench("eigenvector")(
        algo.Eigenvector.run(spark, sym, P, tol = 0.0, maxIter = 10)
          .scores.count())
      bench("salsa")(
        algo.Salsa.run(spark, g.edges, P, tol = 0.0, maxIter = 10)
          .scores.count())
      bench("cliques4")(
        Triangles.countCliques4(spark, GraphOps.undirectedPairs(g.edges), P))
      // tighter caps than the oracle query: the entity graph has
      // co-mention hubs, and the pair universe is the cost driver
      bench("simrank")(
        algo.SimRank.run(spark, g.edges, maxIter = 5, numPartitions = P,
          maxInDegree = 32, maxCenterOutDegree = 64).scores.count())
      // the incremental-re-rank win: restart from this run's converged
      // ranks and count the supersteps the warm start saves
      val prior = pr.ranks.localCheckpoint(true)
      prior.count()
      val warm = bench[PageRank.Result]("pagerank_warm")(
        PageRank.run(spark, sym, P, init = Some(prior)))
      extra += "pagerank_warm_iterations" -> warm.iterations.toDouble
      Superstep.freeCheckpoint(prior)
      bench("backbone")(
        GraphOps.disparityBackbone(
          GraphOps.undirectedPairs(g.edges).withColumn("weight",
            // entity ids are 64-bit hashes: mod-reduce BEFORE the add
            // or src + dst overflows under ANSI
            lit(1L) + pmod(pmod(col("src"), lit(5L)) + pmod(col("dst"), lit(5L)),
              lit(5L))))
          .filter(col("keep")).count())
      // incremental maintenance: 5% of the pairs arrive as the delta;
      // only the incremental step is timed (the prior labeling / old
      // count is the state an ingestion pipeline already holds)
      val pairsAll = GraphOps.undirectedPairs(g.edges).localCheckpoint(true)
      val isDelta = pmod(xxhash64(col("src"), col("dst")), lit(20L)) === 0
      val oldPairs = pairsAll.filter(!isDelta).localCheckpoint(true)
      val deltaPairs = pairsAll.filter(isDelta).localCheckpoint(true)
      val prevCc = ConnectedComponents.run(spark, oldPairs, None, P)
        .localCheckpoint(true)
      prevCc.count()
      bench("cc_incremental")(
        ConnectedComponents.incremental(spark, prevCc, deltaPairs, P).count())
      val triInc = bench[Long]("tri_incremental")(
        Triangles.incrementalDelta(spark, oldPairs, deltaPairs, P))
      extra += "tri_incremental_delta" -> triInc.toDouble
      Seq(pairsAll, oldPairs, deltaPairs, prevCc)
        .foreach(Superstep.freeCheckpoint)
      // weighted/temporal/edge-grain variants over the same graph
      // (weights and timestamps mod-reduced: entity ids are hashes)
      bench("edge_betweenness")(
        algo.Betweenness.edgeScores(spark, sym, lms, P).count())
      val symW = sym.withColumn("w",
        lit(1L) + pmod(pmod(col("src"), lit(3L)) + pmod(col("dst"), lit(3L)),
          lit(3L)))
      bench("lpa_weighted")(
        LabelPropagation.run(spark, symW, P, maxIter = 10,
          weightCol = Some("w")).labels.count())
      val tEdges = g.edges.withColumn("ts",
        lit(1L) + pmod(pmod(col("src"), lit(1000003L)) * 7
          + pmod(col("dst"), lit(1000003L)) * 13, lit(50L)))
      bench("temporal_reach")(
        algo.ShortestPaths.earliestArrival(spark, tEdges,
          sym.select(col("src").as("id")).distinct().orderBy(col("id")).limit(3),
          startTime = 0L, P).count())
      bench("temporal_fastest")(
        algo.ShortestPaths.fastestDuration(spark, tEdges,
          sym.select(col("src").as("id")).distinct().orderBy(col("id")).limit(3),
          startTime = 0L, P).count())
      val trans = bench[Double]("transitivity")(
        Triangles.transitivity(spark, GraphOps.undirectedPairs(g.edges), P)
          .first().getDouble(2))
      extra += "transitivity_value" -> trans
      bench("induced_sample")(
        GraphOps.inducedSample(g.edges, num = 1, den = 10, salt = 7L).count())
      // web-graph macro structure, graphlet census, spam defense
      val bt = bench[DataFrame]("bowtie")(
        algo.BowTie.decompose(spark, g.edges, P))
      extra += "bowtie_core" ->
        bt.filter(col("region") === "CORE").count().toDouble
      Superstep.freeCheckpoint(bt)
      bench("motifs4")(
        algo.Motifs.fourNode(spark, GraphOps.undirectedPairs(g.edges), P)
          .count())
      bench("spam_mass")(
        algo.TrustRank.spamMass(spark, g.edges,
          sym.select(col("src").as("id")).distinct()
            .filter(pmod(col("id"), lit(20L)) === 0),
          P, maxIter = 10).count())
      bench("pic")(
        algo.Pic.run(spark, sym, k = 8, iters = 10, numPartitions = P,
          seedMod = 1000003L).count())
      bench("clique_percolation")(
        algo.CliquePercolation.run(spark,
          GraphOps.undirectedPairs(g.edges), P).count())
      bench("hitting_time")(
        algo.HittingTime.run(spark, sym,
          sym.select(col("src").as("id")).distinct()
            .filter(pmod(col("id"), lit(20L)) === 0),
          iters = 15, numPartitions = P).count())
      bench("triad_census")(
        algo.TriadCensus.run(spark, g.edges, None, P).count())
      bench("wl_refine")(
        algo.Wl.refine(spark, sym, rounds = 4, numPartitions = P).count())
      val cascadeSeeds = sym.select(col("src").as("id")).distinct()
        .filter(pmod(col("id"), lit(20L)) === 0)
      val casc = bench[DataFrame]("cascade")(
        algo.Cascade.run(spark, sym, cascadeSeeds, k = 2, maxRounds = 50,
          numPartitions = P))
      extra += "cascade_activated" -> casc.count().toDouble
      Superstep.freeCheckpoint(casc)
    }

    // round-3 late additions #2: priority-peel / forest / embedding ops
    if (sys.env.get("GRAFT_BENCH_GRAPH3").contains("1")) {
      bench("mis")(algo.Mis.run(spark, sym, numPartitions = P).count())
      // JP coloring is benched on a SYNTHETIC uniform graph, not the
      // entity graph: co-occurrence graphs contain document-cliques,
      // and any independent-set-per-round schedule needs ≥ ω(G)
      // rounds on a clique (the same structural bound that keeps
      // Mis.coloring out of this table — see BASELINE.md; a
      // quadratic-skew synthesis re-creates the problem as a hub
      // near-clique core). A uniform G(n, m) has ω ≈ 3, so the row
      // measures the superstep machinery and the O(log n)-rounds
      // claim, not the fixture's clique number.
      val vJp = 100000L
      def pickJp(k: Int) =
        pmod(xxhash64(col("id"), lit(k)), lit(vJp))
      val jpG = GraphOps.symmetrize(
        spark.range(2000000L).select(pickJp(1).as("src"), pickJp(2).as("dst"))
          .filter(col("src") =!= col("dst"))).localCheckpoint(true)
      val jpM = jpG.count()
      val jp = bench[algo.Coloring.Result]("jp_coloring")(
        algo.Coloring.run(spark, jpG, numPartitions = P, maxRounds = 200,
          checkEvery = 4))
      extra += "jp_coloring_rounds" -> jp.rounds.toDouble
      extra += "jp_coloring_edges" -> jpM.toDouble
      jpG.unpersist()
      bench("influence_seeds")(
        algo.InfluenceMax.degreeDiscount(spark, sym, k = 10,
          numPartitions = P).seeds.count())
      // the documented composition: layer the SCC condensation DAG
      // (shallow — depth tracks the component hierarchy, not |V|).
      // Layering an id-ordered orientation of the raw graph instead
      // measured 93 s: that orientation is a DEEP DAG (rounds = longest
      // increasing-id path), the inherent cost of depth, not a plan flaw.
      val scc = algo.Scc.run(spark, g.edges, numPartitions = P)
      val cond = algo.Scc.condensation(g.edges, scc)
        .select(col("csrc").as("src"), col("cdst").as("dst"))
        .localCheckpoint(true)
      cond.count()
      bench("topo_layers")(
        algo.Topology.layers(spark, cond, numPartitions = P).count())
      Superstep.freeCheckpoint(cond)
      val ew = GraphOps.undirectedPairs(g.edges).select(col("src"), col("dst"),
        (lit(1L) + pmod(pmod(col("src"), lit(1000003L)) * 7
          + pmod(col("dst"), lit(1000003L)) * 13, lit(97L))).as("weight"))
      bench("mst")(algo.Mst.run(spark, ew, numPartitions = P).count())
      bench("matching")(
        algo.Matching.run(spark, g.edges, numPartitions = P).count())
      val seeds = sym.select(col("src").as("id")).distinct()
        .filter(pmod(col("id"), lit(20L)) === 0)
      bench("sweep_cut")(
        graph.LocalCluster.sweepCut(spark, sym, seeds, k = 64, iters = 5,
          numPartitions = P).count())
      val pairs = graph.RandomWalks.skipGramPairs(
        graph.RandomWalks.run(spark, sym,
          sym.select(col("src").as("id")).distinct(),
          walksPerVertex = 2, walkLength = 8, numPartitions = P),
        window = 2).localCheckpoint(true)
      val nPairs = pairs.count()
      extra += "node_embed_pairs" -> nPairs.toDouble
      bench("node_embed")(
        graph.NodeEmbeddings.randomIndexing(pairs, dims = 16).count())
      Superstep.freeCheckpoint(pairs)
      bench("matching_weighted")(
        algo.Matching.runWeighted(spark,
          GraphOps.undirectedPairs(g.edges).withColumn("weight",
            lit(1L) + pmod(pmod(col("src"), lit(1000003L))
              + pmod(col("dst"), lit(1000003L)), lit(7L))),
          numPartitions = P).count())
      val pw = GraphOps.undirectedPairs(g.edges).withColumn("weight",
        lit(1L) + pmod(pmod(col("src"), lit(1000003L))
          + pmod(col("dst"), lit(1000003L)), lit(7L)))
        .localCheckpoint(true)
      pw.count()
      val bis = bench[DataFrame]("partition", cleanup = _.unpersist()) {
        val b = graph.Partitioner.bisect(spark, pw, levels = 3,
          numPartitions = P).localCheckpoint(true)
        b.count(); b
      }
      bench("partition_refine")(
        graph.Partitioner.refine(spark, pw, bis, numPartitions = P).count())
      extra += "partition_cut" ->
        graph.Partitioner.edgeCut(pw, bis).toDouble
      bis.unpersist()
      // k-way recursive bisection: 3 bisect+refine calls over
      // geometrically-shrinking side subgraphs (levels=2 each)
      val kway = bench[DataFrame]("partition_kway", cleanup = _.unpersist()) {
        val p4 = graph.Partitioner.partition(spark, pw, k = 4, levels = 2,
          numPartitions = P).localCheckpoint(true)
        p4.count(); p4
      }
      extra += "partition_kway_cut" ->
        graph.Partitioner.edgeCut(pw, kway).toDouble
      kway.unpersist()
      Superstep.freeCheckpoint(pw)
    }

    // round-3 late additions #3: corpus-scale exact sketch-finishers
    if (sys.env.get("GRAFT_BENCH_CORPUS3").contains("1")) {
      Seq("stats_heavy_hitters", "cur_exact_quantile", "cur_group_quantiles",
          "bpe_pair_counts", "bpe_merges", "textrank_summary",
          "url_canonicalize")
        .foreach { name =>
          bench(name)(SparkEntry.queries(name)(spark, sfDir).count())
        }
    }

    // ── headline: PageRank on a large synthesized skewed edge table ──
    // (same distribution the extractor produces; sized so the
    // measurement is algorithm-bound, not corpus-generation-bound)
    val synthEdges = sys.env.getOrElse("GRAFT_BENCH_PR_EDGES", "10000000").toLong
    if (synthEdges > 0) {
      val v = math.max(synthEdges / 20, 1000L)
      def pick(k: Int) = {
        val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
        floor(lit(v.toDouble) * r * r).cast("long")
      }
      val big = GraphOps.symmetrize(
        spark.range(synthEdges).select(pick(1).as("src"), pick(2).as("dst"))
          .filter(col("src") =!= col("dst"))).localCheckpoint(true)
      val mBig = big.count()
      val prBig = bench[PageRank.Result]("pagerank_synth")(PageRank.run(spark, big, P))
      extra += "pagerank_synth_iterations" -> prBig.iterations.toDouble
      extra += "pagerank_synth_edges" -> mBig.toDouble
      extra += "pagerank_synth_edges_per_sec" ->
        mBig.toDouble * prBig.iterations / results("pagerank_synth")
      big.unpersist()
    }

    // ── relational / dedup / text surface on the sf tables ──
    val hot = Seq("q1_agg_pricing_summary", "j1_edge_expansion", "a4_degree_count",
      "w1_row_number_per_group", "dedup_exact", "dedup_minhash_lsh",
      "text_fingerprint", "sim_topk_bruteforce")
    hot.foreach { name =>
      bench(name)(SparkEntry.queries(name)(spark, sfDir).count())
    }

    // ── ANN family (VERDICT r4 #6): NN-Descent build + beam search in
    //    the DEFAULT suite so regressions hit the bench protocol, not
    //    just the ProbeKnn main. Vectors synthesized at a small-n size
    //    (the sf embeddings tables are ≤2k rows — too small to bench);
    //    NOTE for round-over-round comparison: these two rows are NEW
    //    in r5 and add to "total" — see BASELINE.md r5.
    val knnN = sys.env.getOrElse("GRAFT_BENCH_KNN_VECS", "25000").toLong
    if (knnN > 0) {
      val dims = 32
      val vecs = spark.range(knnN).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(dims)),
          j => (pmod(xxhash64(col("id"), j, lit(7L)), lit(2000001L))
            .cast("double") / 1e6 - 1.0).cast("float")).as("embedding"))
        .localCheckpoint(true)
      vecs.count()
      val kg = bench[DataFrame]("knn_graph",
        cleanup = Superstep.freeCheckpoint) {
        val g = graft.sim.KnnGraph.run(spark, vecs, k = 6, rounds = 2)
          .neighbors.localCheckpoint(true)
        g.count(); g
      }
      extra += "knn_graph_vectors" -> knnN.toDouble
      bench("knn_search")(
        graft.sim.KnnGraph.search(vecs, kg,
          vecs.filter(pmod(col("vec_id"), lit(50L)) === 0),
          k = 5, beam = 10, rounds = 4).count())
      Superstep.freeCheckpoint(kg)
      vecs.unpersist()
    }

    val total = results.values.sum
    val qs = (results ++ extra).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val runsJson = rawRuns
      .map { case (k, ts) => s""""$k":[${ts.map(t => f"$t%.3f").mkString(",")}]""" }
      .mkString("{", ",", "}")
    val stealJson = stealPct
      .map { case (k, ss) => s""""$k":[${ss.map(s => f"$s%.1f").mkString(",")}]""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":"$cpus","files":$nFiles,"reps":$reps,"runs":$runsJson,"steal_pct":$stealJson,"pagerank_edges_per_sec":${extra("pagerank_edges_per_sec")}}""")
    spark.stop()
  }
}

/** Two-parallelism scaling evidence (north rule's N vs 4N executor
  * criterion, sandbox proxy per BASELINE.md): the identical PageRank
  * job at local[8] and local[32] on the same input; prints throughput
  * at both plus efficiency = (T8/T32)/4.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lo = sys.env.getOrElse("GRAFT_SCALE_LO", "8")
    val hi = sys.env.getOrElse("GRAFT_SCALE_HI", "32")

    // identical job at both sizes: SAME partition count so only the
    // executor-thread count varies, like N vs 4N executors on a cluster
    // reading the same partitioned table. Default 4×hi: enough waves at
    // the high end that skewed partition sizes amortize.
    val fixedParts = sys.env.getOrElse("GRAFT_SCALE_PARTS", (4 * hi.toInt).toString).toInt

    // GRAFT_SCALE_EDGES: synthesize the edge table directly at a target
    // size with the same quadratic-skew vertex distribution the corpus
    // extractor produces — the scaling measurement must be dominated by
    // the ALGORITHM, not by generating a toy corpus. 0 = derive edges
    // from the corpus pipeline instead.
    val directEdges = sys.env.getOrElse("GRAFT_SCALE_EDGES", "20000000").toLong

    // GRAFT_SCALE_REPS: repeat the MEASURED PageRank run per level and
    // keep the fastest — this VM's time-varying CPU steal (±40 %+,
    // documented in BASELINE.md) otherwise pollutes the lo/hi RATIO
    // whenever a steal spike lands inside one window but not the other.
    // Synthesis + checkpoint stay outside the timed region either way.
    val reps = sys.env.getOrElse("GRAFT_SCALE_REPS", "1").toInt

    def runAt(cpus: String): (Double, Long, Int) = {
      val spark = Bench.buildSession(cpus)
      spark.conf.set("spark.sql.shuffle.partitions", fixedParts.toString)
      val edges =
        if (directEdges > 0) {
          val v = math.max(directEdges / 20, 1000L) // avg degree ~20
          def pick(k: Int) = {
            val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
            floor(lit(v.toDouble) * r * r).cast("long")
          }
          spark.range(directEdges)
            .select(pick(1).as("src"), pick(2).as("dst"))
            .filter(col("src") =!= col("dst"))
        } else {
          val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
          val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (400L * docN).toString).toLong
          val vScale = sys.env.getOrElse("GRAFT_VSCALE", "200").toInt
          val c = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
          Extractor.relationships(c).select(col("src"), col("dst"))
        }
      val sym = GraphOps.symmetrize(edges).localCheckpoint(true)
      val m = sym.count()
      val runs = (1 to reps).map { _ => Bench.time(PageRank.run(spark, sym, fixedParts)) }
      val (pr, dt) = runs.minBy(_._2)
      spark.stop()
      (dt, m, pr.iterations)
    }

    val (tLo, m, itLo) = runAt(lo)
    val (tHi, _, itHi) = runAt(hi)
    val thLo = m.toDouble * itLo / tLo
    val thHi = m.toDouble * itHi / tHi
    val eff = (thHi / thLo) / (hi.toDouble / lo.toDouble)
    println(
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","lo_cpus":$lo,"hi_cpus":$hi,"edges":$m,"throughput_lo":$thLo,"throughput_hi":$thHi,"sec_lo":$tLo,"sec_hi":$tHi,"sf":"$sfDir"}""")
  }
}

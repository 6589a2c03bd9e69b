package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Scratch diagnostic for the round-3 additions (heavy hitters /
  * exact quantiles / weighted matching): round counts, result sizes
  * and spot values before the oracle twins are authored. Not part of
  * the driver surface.
  */
object ProbeNewOps {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Bench.buildSession(cpus)
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // heavy hitters over the widened planted domain
    val items = docs.select(col("doc_id"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
      .select(when(pmod(col("doc_id"), lit(13L)) === 0, col("tok"))
        .otherwise(concat_ws("_", col("tok"), pmod(col("doc_id"), lit(997L))))
        .as("item"))
    val hh = graft.text.HeavyHitters.frequentItems(items, "item", denom = 400)
    println(s"[probe] heavy_hitters rows=${hh.count()}")
    hh.orderBy(desc("occurrences")).show(12, truncate = false)

    // exact quantiles of length(text)
    val lv = docs.select(length(col("text")).cast("long").as("len"))
    val qs = graft.curation.Quantiles.exactQuantiles(
      lv, "len", Seq((1, 2), (9, 10), (99, 100)))
    qs.show(false)
    val gq = graft.curation.Quantiles.groupQuantiles(
      docs.select(col("lang"), length(col("text")).as("len")),
      "lang", "len", 1, 2)
    gq.orderBy("lang").show(false)

    // weighted matching round count on the arithmetic fixture graph
    val ew = GraphOps.undirectedPairs(SparkEntry.sqlGraphEdges(spark))
      .withColumn("weight", lit(1L) + pmod(col("src") + col("dst"), lit(7L)))
    val m = graft.algo.Matching.runWeighted(spark, ew, numPartitions = 8)
    println(s"[probe] weighted matching edges=${m.count()} " +
      s"rounds=${m.agg(max(col("round"))).head().getLong(0)} " +
      s"totalW=${m.agg(sum(col("w"))).head().getLong(0)}")

    // multilevel bisection quality on the locality fixture graph
    if (sys.env.get("GRAFT_PROBE_PART").contains("1")) {
      val ring = spark.range(1500L).select(col("id").as("a"))
      val pfix = ring.select(col("a").as("src"),
          pmod(col("a") + 1L, lit(1500L)).as("dst"))
        .unionAll(ring.select(col("a").as("src"),
          pmod(col("a") + lit(5L) + pmod(col("a"), lit(4L)), lit(1500L)).as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      val pew = GraphOps.undirectedPairs(pfix)
        .withColumn("weight", lit(1L) + pmod(col("src") + col("dst"), lit(7L)))
      // level round counts for the oracle unroll
      val m1 = graft.algo.Matching.runWeighted(spark, pew, numPartitions = 8)
      println(s"[probe] part level1 matching rounds=" +
        m1.agg(max(col("round"))).head().getLong(0))
      val (_, c1) = graft.algo.Matching.coarsen(spark, pew, numPartitions = 8,
        strongOnly = true)
      val m2 = graft.algo.Matching.runWeighted(spark, c1, numPartitions = 8)
      println(s"[probe] part level2 matching rounds=" +
        m2.agg(max(col("round"))).head().getLong(0))
      for (lv <- Seq(1, 2, 3, 4)) {
        val parts = graft.graph.Partitioner.bisect(spark, pew, levels = lv,
          numPartitions = 8).cache()
        val sizes = parts.groupBy("part").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val cut = graft.graph.Partitioner.edgeCut(pew, parts)
        val totalW = pew.agg(sum(col("weight"))).head().getLong(0)
        // baseline: id-parity split of the same graph
        val naive = graft.graph.Partitioner.edgeCut(pew,
          pew.select(col("src").as("id")).unionAll(pew.select(col("dst").as("id")))
            .distinct().withColumn("part", pmod(col("id"), lit(2L))))
        val refined = graft.graph.Partitioner.refine(spark, pew, parts,
          numPartitions = 8).cache()
        val rcut = graft.graph.Partitioner.edgeCut(pew, refined)
        val rsz = refined.groupBy("part").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        println(s"[probe] bisect levels=$lv sizes=$sizes cut=$cut " +
          s"naive=$naive totalW=$totalW refined_cut=$rcut refined_sizes=$rsz")
        refined.unpersist()
        parts.unpersist()
      }
      // k-way recursive bisection
      for (k <- Seq(4, 8)) {
        val kp = graft.graph.Partitioner.partition(spark, pew, k,
          levels = 1, numPartitions = 8).cache()
        val sz = kp.groupBy("part").count().orderBy("part").collect()
          .map(r => r.getLong(1)).toSeq
        val cut = graft.graph.Partitioner.edgeCut(pew, kp)
        println(s"[probe] kway k=$k sizes=$sz cut=$cut")
        kp.unpersist()
      }
    }

    // entity-graph round counts (matches the GRAPH3 bench input)
    if (sys.env.get("GRAFT_PROBE_ENTITY").contains("1")) {
      val docN = docs.count()
      val c = graft.corpus.CorpusGen.corpus(spark, 20L * docN, seed = 42L,
        vertexScale = 40).localCheckpoint(true)
      c.count()
      val snap = graft.normalize.Normalize.fullChain(
        graft.normalize.Normalize.Snapshot(
          graft.extract.Extractor.entities(c),
          graft.extract.Extractor.relationships(c)))
      val g = GraphOps.semanticGraph(snap)
      val e = g.edges.localCheckpoint(true)
      e.count()
      val ewE = GraphOps.undirectedPairs(e).withColumn("weight",
        lit(1L) + pmod(pmod(col("src"), lit(1000003L))
          + pmod(col("dst"), lit(1000003L)), lit(7L)))
      val mw = graft.algo.Matching.runWeighted(spark, ewE,
        numPartitions = cpus.toInt)
      println(s"[probe] entity weighted matching edges=${mw.count()} " +
        s"rounds=${mw.agg(max(col("round"))).head().getLong(0)}")
      val mu = graft.algo.Matching.run(spark, e, numPartitions = cpus.toInt)
      println(s"[probe] entity unweighted matching edges=${mu.count()} " +
        s"rounds=${mu.agg(max(col("round"))).head().getLong(0)}")
    }
    spark.stop()
  }
}

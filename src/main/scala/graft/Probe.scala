package graft

import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.graph.GraphOps
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** Scratch diagnostic: split pipeline_normalize / graph_build wall time
  * into sub-steps to localize regressions (not part of the driver
  * surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (20L * docN).toString).toLong

    val (c, t0) = Bench.time {
      val c0 = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = 40)
        .localCheckpoint(true)
      c0.count(); c0
    }
    println(s"[probe] corpus_gen ${t0}s")

    val (raw, t1) = Bench.time {
      val s0 = Snapshot(Extractor.entities(c), Extractor.relationships(c))
      val m = Normalize.materialize(s0)
      m.entities.count(); m.edges.count(); m
    }
    println(s"[probe] extract_only ${t1}s")

    val (out, t2) = Bench.time {
      val o = Normalize.fullChain(raw)
      o.entities.count(); o.edges.count()
      o
    }
    println(s"[probe] normalize_chain_only ${t2}s")

    val (g, t3) = Bench.time {
      val gt = GraphOps.semanticGraph(out)
      GraphOps.GraphTables(gt.vertices.localCheckpoint(true), gt.edges.localCheckpoint(true))
    }
    println(s"[probe] graph_build ${t3}s  (vertices=${g.vertices.count()}, edges=${g.edges.count()})")

    val (_, t4) = Bench.time {
      val gt2 = GraphOps.semanticGraph(out)
      gt2.edges.count()
    }
    println(s"[probe] graph_build_again_nocp ${t4}s")

    // eager per-stage attribution of the normalize chain
    val stages: Seq[(String, Snapshot => Snapshot)] = Seq(
      ("m1", Normalize.m1NormalizeNames), ("backfill", Normalize.backfillAppliesTo),
      ("m2", Normalize.m2SameLabelDedup), ("m3", Normalize.m3CrossLabelDedup),
      ("m4", Normalize.m4DeleteGeneric), ("m5", Normalize.m5MergePlurals),
      ("m6", Normalize.m6IndustryConsolidation),
      ("m7", Normalize.m7RelabelMislabeledChallenges))
    var cur = raw
    stages.foreach { case (n, f) =>
      val (next, dt) = Bench.time {
        val o = Normalize.materialize(f(cur))
        o.entities.count(); o.edges.count(); o
      }
      println(s"[probe] stage_$n ${dt}s")
      cur = next
    }
    spark.stop()
  }
}

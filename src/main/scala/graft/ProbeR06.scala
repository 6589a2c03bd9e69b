package graft

import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** Scratch diagnostic for round 6: per-stage cardinalities of the
  * normalize chain — entity/edge counts, how many entity ids each
  * stage's merge mapping moves, and how many edges touch a moved id —
  * the numbers that decide whether the remap dedup can split into
  * "untouched passthrough + small-side dedup" (guide §2.3/§3.2).
  */
object ProbeR06 {
  // scalastyle:off println
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)

    val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (20L * docN).toString).toLong
    val vScale = sys.env.getOrElse("GRAFT_VSCALE", "40").toInt

    val c = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
      .localCheckpoint(true)
    c.count()

    var s = Normalize.materialize(
      Snapshot(Extractor.entities(c), Extractor.relationships(c)))
    println(s"[probe] extract: entities=${s.entities.count()} edges=${s.edges.count()}")

    val stages: Seq[(String, Snapshot => Snapshot)] = Seq(
      "m1" -> Normalize.m1NormalizeNames,
      "backfill" -> Normalize.backfillAppliesTo,
      "m2" -> Normalize.m2SameLabelDedup,
      "m3" -> Normalize.m3CrossLabelDedup,
      "m4" -> Normalize.m4DeleteGeneric,
      "m5" -> Normalize.m5MergePlurals,
      "m6" -> Normalize.m6IndustryConsolidation,
      "m7" -> Normalize.m7RelabelMislabeledChallenges)
    stages.foreach { case (name, f) =>
      val prevIds = s.entities.select(col("id")).localCheckpoint(true)
      val prevEdges = s.edges.localCheckpoint(true)
      val next = Normalize.materialize(f(s))
      val nE = next.entities.count(); val nR = next.edges.count()
      // ids that disappeared = merged/deleted (the remap's mapping side)
      val moved = prevIds.join(next.entities.select(col("id")), Seq("id"), "left_anti")
        .localCheckpoint(true)
      val nMoved = moved.count()
      val touched = prevEdges
        .join(moved.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .unionAll(prevEdges.join(moved.withColumnRenamed("id", "dst"),
          Seq("dst"), "left_semi").select(col("src"), col("dst"), col("relType")))
        .count()
      println(s"[probe] $name: entities=$nE edges=$nR movedIds=$nMoved touchedEdgeRows~=$touched")
      s = next
    }
    spark.stop()
  }
}

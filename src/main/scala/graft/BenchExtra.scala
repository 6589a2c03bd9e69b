package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** Round-6 optimization diagnostics (guide §1.4): noop-sink-isolated
  * timings for the sub-phases inside the composite bench entries, plus
  * `.explain("formatted")` capture for the judge's plans/r06 files.
  * Separate from the FROZEN `Bench.scala` — nothing here feeds the
  * driver's BENCH json.
  *
  * Knobs (same as Bench): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * GRAFT_BENCH_FILES, GRAFT_VSCALE; plus
  *   GRAFT_PLAN_DIR     where to write <phase>_<suffix>.txt plan dumps
  *   GRAFT_PLAN_SUFFIX  "before" / "after"
  */
object BenchExtra {
  // scalastyle:off println
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val planDir = sys.env.getOrElse("GRAFT_PLAN_DIR", "")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
    val spark = Bench.buildSession(cpus)
    val sc = spark.sparkContext

    val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (20L * docN).toString).toLong
    val vScale = sys.env.getOrElse("GRAFT_VSCALE", "40").toInt

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    def dumpPlan(name: String, df: DataFrame): Unit =
      if (planDir.nonEmpty) {
        val p = java.nio.file.Paths.get(planDir)
        java.nio.file.Files.createDirectories(p)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(p.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
      }

    /** Time a noop-sink materialization of every column of `df`. */
    def entry(name: String, plan: Boolean = true)(df: => DataFrame): Unit = {
      val frame = df
      if (plan) dumpPlan(name, frame)
      sc.setJobDescription(name)
      val (_, dt) = Bench.time {
        frame.write.format("noop").mode("overwrite").save()
      }
      sc.setJobDescription(null)
      results += name -> dt
      println(f"[extra] $name%-28s $dt%8.3f s")
    }

    // ── pipeline_normalize sub-phases ──
    val c = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
      .localCheckpoint(true)
    c.count()

    // marker scan alone (materializes the shared lazy checkpoint)
    Extractor.evictMarkers(c)
    entry("px_marker_scan") { Extractor.markers(c) }
    // with markers warm: the two consumers' aggregation cost
    entry("px_entities_agg") { Extractor.entities(c) }
    entry("px_relationships") { Extractor.relationships(c) }
    // cold end-to-end extract (what pipeline_normalize actually pays)
    Extractor.evictMarkers(c)

    var s = Normalize.materialize(
      Snapshot(Extractor.entities(c), Extractor.relationships(c)))
    val stages: Seq[(String, Snapshot => Snapshot)] = Seq(
      "m1_names" -> Normalize.m1NormalizeNames,
      "backfill" -> Normalize.backfillAppliesTo,
      "m2_same_label" -> Normalize.m2SameLabelDedup,
      "m3_cross_label" -> Normalize.m3CrossLabelDedup,
      "m4_generic" -> Normalize.m4DeleteGeneric,
      "m5_plurals" -> Normalize.m5MergePlurals,
      "m6_industry" -> Normalize.m6IndustryConsolidation,
      "m7_relabel" -> Normalize.m7RelabelMislabeledChallenges)
    stages.foreach { case (name, f) =>
      val next = f(s)
      dumpPlan(s"px_${name}_entities", next.entities)
      if (!(next.edges eq s.edges)) dumpPlan(s"px_${name}_edges", next.edges)
      sc.setJobDescription(s"px_$name")
      val (out, dt) = Bench.time {
        val m = Normalize.materialize(next)
        m.entities.count(); m.edges.count()
        m
      }
      sc.setJobDescription(null)
      results += s"px_$name" -> dt
      println(f"[extra] px_$name%-26s $dt%8.3f s")
      s = out
    }

    val total = results.values.sum
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra","value":${f"$total%.3f"},"unit":"sec","phases":$qs,"files":$nFiles,"cpus":"$cpus"}""")
    spark.stop()
  }
}

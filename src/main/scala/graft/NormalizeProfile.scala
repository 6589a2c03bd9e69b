package graft

import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** Per-stage wall-time profile of the extract → normalize chain — the
  * diagnostic behind the `pipeline_normalize` bench row. Each stage is
  * EAGERLY materialized here (unlike `fullChain`, whose lazy stage
  * checkpoints deliberately blur stage attribution into the next
  * stage's first shuffle), so the numbers answer "which stage is the
  * fat one", not "what does the fused chain cost" — the fused cost is
  * the Bench row.
  *
  * Same knobs as Bench: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * GRAFT_BENCH_FILES, GRAFT_VSCALE. Emits one JSON line.
  */
object NormalizeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Bench.buildSession(cpus)

    val docN = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nFiles = sys.env.getOrElse("GRAFT_BENCH_FILES", (20L * docN).toString).toLong
    val vScale = sys.env.getOrElse("GRAFT_VSCALE", "40").toInt

    val c = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
      .localCheckpoint(true)
    c.count()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def step(name: String)(f: => Snapshot): Snapshot = {
      val (s, dt) = Bench.time {
        val out = Normalize.materialize(f)
        out.entities.count(); out.edges.count()
        out
      }
      results += name -> dt
      s
    }

    var s = step("extract")(Snapshot(Extractor.entities(c), Extractor.relationships(c)))
    val stages: Seq[(String, Snapshot => Snapshot)] = Seq(
      "m1_names" -> Normalize.m1NormalizeNames,
      "backfill" -> Normalize.backfillAppliesTo,
      "m2_same_label" -> Normalize.m2SameLabelDedup,
      "m3_cross_label" -> Normalize.m3CrossLabelDedup,
      "m4_generic" -> Normalize.m4DeleteGeneric,
      "m5_plurals" -> Normalize.m5MergePlurals,
      "m6_industry" -> Normalize.m6IndustryConsolidation,
      "m7_relabel" -> Normalize.m7RelabelMislabeledChallenges)
    stages.foreach { case (name, f) => s = step(name)(f(s)) }

    val total = results.values.sum
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"normalize_profile","value":${f"$total%.3f"},"unit":"sec","stages":$qs,"files":$nFiles,"cpus":"$cpus"}""")
    spark.stop()
  }
}

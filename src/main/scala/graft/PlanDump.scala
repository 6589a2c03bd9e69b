package graft

import org.apache.spark.sql.functions._

import graft.algo.{ModularityRefine, Superstep}
import graft.curation.Curation
import graft.dedup.Dedup
import graft.sim.Similarity

/** Diagnostic: dump the physical plans of the scale-critical operators
  * (the shapes PlanSpec pins) — source for PLANS.md.
  */
object PlanDump {
  // scalastyle:off println
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession("4")
    import spark.implicits._

    def dump(title: String)(plan: => String): Unit = {
      println(s"\n════ $title ════")
      println(plan)
    }

    val docs = (0L until 200L)
      .map(i => (i, s"doc text body $i with words " + ("x" * (i % 17).toInt)))
      .toDF("doc_id", "text")
    val vecs = (0L until 120L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")

    Superstep.withoutAQE(spark) {
      val P = 4
      val e = (0L until 60L).map(i => (i, (i + 1) % 60, 1L)).toDF("src", "dst", "w")
        .repartition(P, col("src"))
      val deg = e.groupBy(col("src").as("id")).agg(sum("w").as("k"))
        .repartition(P, col("id"))
      val labels = (0L until 60L).map(i => (i, i)).toDF("id", "community")
        .repartition(P, col("id"))
      dump("ModularityRefine.scoreRound (one local-move phase)") {
        ModularityRefine.scoreRound(e, labels, deg, 120L, P, 0)
          .queryExecution.executedPlan.toString
      }
    }

    dump("Dedup.minHashNearDups (capped LSH, verify join)") {
      Dedup.minHashNearDups(docs, threshold = 0.7)
        .queryExecution.executedPlan.toString
    }
    dump("Similarity.bruteForceTopK (bounded map-side top-k)") {
      Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") % 40 === 0), k = 3)
        .queryExecution.executedPlan.toString
    }
    dump("Curation.packSequences (distributed prefix sum)") {
      Curation.packSequences(docs, budget = 64, bucketSize = 16)
        .queryExecution.executedPlan.toString
    }
    spark.stop()
  }
  // scalastyle:on println
}

package graft

import org.apache.spark.sql.functions._

import graft.algo.{ModularityRefine, Superstep}

/** Scratch diagnostic: dump one refine round's physical plan. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession("4")
    import spark.implicits._
    Superstep.withoutAQE(spark) {
      val P = 4
      val e = (0L until 60L).map(i => (i, (i + 1) % 60, 1L))
        .toDF("src", "dst", "w").repartition(P, col("src"))
      val deg = e.groupBy(col("src").as("id")).agg(sum("w").as("k"))
        .repartition(P, col("id"))
      val labels = (0L until 60L).map(i => (i, i)).toDF("id", "community")
        .repartition(P, col("id"))
      val next = ModularityRefine.scoreRound(e, labels, deg, 120L, P, 0)
      // scalastyle:off println
      println(next.queryExecution.executedPlan.toString)
      // scalastyle:on println
    }
    spark.stop()
  }
}

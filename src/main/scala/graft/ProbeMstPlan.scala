package graft

import org.apache.spark.sql.functions._

/** Scratch diagnostic: physical-plan shape of the Borůvka pick
  * aggregation (is min(struct) partial-aggregated, and on which
  * aggregate path?) plus the MIS neighbor-min round.
  */
object ProbeMstPlan {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.range(10000L).select(
      col("id").as("u"), pmod(col("id") * 7 + 3, lit(10000L)).as("v"),
      pmod(col("id"), lit(97L)).as("w"),
      col("id").as("cu"), pmod(col("id") * 7 + 3, lit(10000L)).as("cv"))

    val bo = e.select(col("cu").as("comp"),
        struct(col("w"), col("u"), col("v"), col("cv").as("other")).as("s"))
      .unionAll(e.select(col("cv").as("comp"),
        struct(col("w"), col("u"), col("v"), col("cu").as("other")).as("s")))
    val picks = bo.groupBy(col("comp")).agg(min(col("s")).as("s"))
    println("════ MST pick agg ════")
    println(picks.queryExecution.executedPlan.toString.take(4000))

    val nbrMin = e.select(col("u").as("src"), col("v").as("dst"))
      .groupBy(col("src").as("id"))
      .agg(min(graft.algo.Mis.key(col("dst"))).as("mn"))
    println("════ MIS neighbor-min agg ════")
    println(nbrMin.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Scratch diagnostic: MIS / coloring round counts on the arithmetic
  * fixture graph (sizes the unrolled DuckDB twins; not driver surface).
  */
object ProbeMis {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.range(1500L).select(col("id").as("a"))
      .filter(pmod(col("a"), lit(10L)) =!= 0)
    def rule(m: Long, c: Long) =
      r.select(col("a").as("src"),
        pmod(col("a") + lit(4L) * (pmod(col("a"), lit(m)) + c), lit(1500L)).as("dst"))
    val e = rule(7, 1).unionAll(rule(11, 3)).unionAll(rule(13, 5))
      .filter(col("src") =!= col("dst")).distinct()
    val sym = GraphOps.symmetrize(e)

    val mis = graft.algo.Mis.run(spark, sym, numPartitions = 8)
    println(s"[probe] MIS members=${mis.count()} rounds=" +
      mis.agg(max(col("round"))).collect()(0).getLong(0))
    val col0 = graft.algo.Mis.coloring(spark, sym, numPartitions = 8)
    println(s"[probe] coloring vertices=${col0.count()} colors=" +
      col0.agg(max(col("color"))).collect()(0).getLong(0))
    spark.stop()
  }
}

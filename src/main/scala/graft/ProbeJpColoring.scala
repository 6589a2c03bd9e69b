package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.Coloring
import graft.graph.GraphOps

/** Focused probe: JP coloring on the uniform G(n, m) synthetic (the
  * GRAPH3 bench row) — rounds, wall, palette; for iterating on the
  * contraction schedule without the full bench suite.
  */
object ProbeJpColoring {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vJp = sys.env.getOrElse("JP_V", "100000").toLong
    val mJp = sys.env.getOrElse("JP_M", "2000000").toLong
    def pick(k: Int) = pmod(xxhash64(col("id"), lit(k)), lit(vJp))
    val g = GraphOps.symmetrize(
      spark.range(mJp).select(pick(1).as("src"), pick(2).as("dst"))
        .filter(col("src") =!= col("dst"))).localCheckpoint(true)
    val m = g.count()
    val t0 = System.nanoTime()
    val res = Coloring.run(spark, g, numPartitions = cpus.toInt, maxRounds = 200,
      contractEvery = sys.env.getOrElse("JP_CONTRACT", "8").toInt,
      checkEvery = sys.env.getOrElse("JP_CHECK", "4").toInt)
    val colors = res.colors.agg(max("color")).head().getInt(0)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"JP: edges=$m rounds=${res.rounds} converged=${res.converged} " +
      f"palette=${colors + 1} wall=$wall%.2f s (${m * res.rounds / wall / 1e6}%.2f M edge-rounds/s nominal)")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.algo.{Louvain, ModularityRefine}
import graft.graph.GraphOps

/** Scratch diagnostic: per-phase wall time of Louvain/ModularityRefine on
  * a synthetic skewed graph (not part of the driver surface).
  */
object ProbeLouvain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nEdges = sys.env.getOrElse("GRAFT_PROBE_EDGES", "50000").toLong
    val rounds = sys.env.getOrElse("GRAFT_PROBE_ROUNDS", "4").toInt
    val levels = sys.env.getOrElse("GRAFT_PROBE_LEVELS", "4").toInt
    val spark = Bench.buildSession(cpus)
    if (sys.env.get("GRAFT_PROBE_NOBLOOM").contains("1")) {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "false")
    }
    val P = cpus.toInt

    def log(s: String): Unit = { System.err.println(s"[probe] $s"); System.err.flush() }

    val v = math.max(nEdges / 20, 100L)
    def pick(k: Int) = {
      val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
      floor(lit(v.toDouble) * r * r).cast("long")
    }
    val sym = GraphOps.symmetrize(
      spark.range(nEdges).select(pick(1).as("src"), pick(2).as("dst"))
        .filter(col("src") =!= col("dst"))).localCheckpoint(true)
    log(s"sym edges = ${sym.count()}")

    val singles = sym.select(col("src").as("id")).distinct()
      .withColumn("community", col("id"))
    var t0 = System.nanoTime()
    val ref = ModularityRefine.run(spark, sym, singles, P, maxRounds = rounds)
    ref.labels.count()
    log(f"refine rounds=$rounds took ${(System.nanoTime() - t0) / 1e9}%.1fs (ran ${ref.rounds})")

    t0 = System.nanoTime()
    val lv = Louvain.run(spark, sym, P, maxLevels = levels, roundsPerLevel = rounds)
    lv.labels.count()
    log(f"louvain levels=$levels rounds=$rounds took ${(System.nanoTime() - t0) / 1e9}%.1fs (ran ${lv.levels})")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Scratch diagnostic: MIS throughput on the pagerank_synth-style
  * skewed edge table (quadratic-skew vertex picks, same distribution
  * the extractor produces) — evidence the peel loop holds at
  * 20 M-edge scale, not just the 1.5 k oracle fixture.
  */
object ProbeMisSynth {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("GRAFT_MIS_SYNTH_EDGES", "20000000").toLong
    val v = math.max(n / 20, 1000L)
    def pick(k: Int) = {
      val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
      floor(lit(v.toDouble) * r * r).cast("long")
    }
    val sym = GraphOps.symmetrize(
      spark.range(n).select(pick(1).as("src"), pick(2).as("dst"))
        .filter(col("src") =!= col("dst"))).localCheckpoint(true)
    val m = sym.count()
    val t0 = System.nanoTime()
    val mis = graft.algo.Mis.run(spark, sym, numPartitions = 128)
    val members = mis.count()
    val rounds = mis.agg(max(col("round"))).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[probe] sym_edges=$m%d members=$members%d rounds=$rounds%d " +
      f"wall=$secs%.1fs edge_rounds_per_sec=${m.toDouble * rounds / secs}%.3g")
    spark.stop()
  }
}

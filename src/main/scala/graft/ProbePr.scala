package graft

import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.graph.GraphOps

/** Scratch diagnostic (r6): attribute pagerank_synth's wall time to
  * setup (cache + degrees + split decision + initial stats) vs the
  * iteration loop, by timing maxIter=0 and maxIter=default on the
  * same synthesized graph as Bench.
  */
object ProbePr {
  // scalastyle:off println
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    val P = spark.sparkContext.defaultParallelism
    val synthEdges = sys.env.getOrElse("GRAFT_BENCH_PR_EDGES", "10000000").toLong

    val v = math.max(synthEdges / 20, 1000L)
    def pick(k: Int) = {
      val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
      floor(lit(v.toDouble) * r * r).cast("long")
    }
    val big = GraphOps.symmetrize(
      spark.range(synthEdges).select(pick(1).as("src"), pick(2).as("dst"))
        .filter(col("src") =!= col("dst"))).localCheckpoint(true)
    val m = big.count()

    (1 to 2).foreach { rep =>
      val (r0, t0) = Bench.time(PageRank.run(spark, big, P, maxIter = 0))
      val (rF, tF) = Bench.time(PageRank.run(spark, big, P))
      println(f"[prprobe] rep$rep edges=$m setup_only=$t0%.2f s full=$tF%.2f s " +
        f"iters=${rF.iterations} per_iter=${(tF - t0) / math.max(rF.iterations, 1)}%.2f s")
    }
    spark.stop()
  }
}

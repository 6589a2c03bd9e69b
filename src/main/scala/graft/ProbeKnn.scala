package graft

import org.apache.spark.sql.functions._

/** Throughput probe for the NN-Descent family at synthesized scale:
  * n deterministic 64-d vectors (hash-uniform components), k-NN graph
  * build + a beam-search sweep; prints one JSON line with wall times
  * and the candidate-pair rate (the quantity the per-round self-join
  * actually pays for). Knobs: GRAFT_KNN_N, GRAFT_KNN_K,
  * GRAFT_KNN_ROUNDS, SPARK_GRAFT_CPUS.
  */
object ProbeKnn {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_KNN_N", "200000").toLong
    val k = sys.env.getOrElse("GRAFT_KNN_K", "10").toInt
    val rounds = sys.env.getOrElse("GRAFT_KNN_ROUNDS", "3").toInt
    val dims = 64
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (pmod(xxhash64(col("id"), d), lit(2000L)).cast("double") / 1000.0
          - 1.0).cast("float")).as("embedding"))
      .localCheckpoint(true)
    vecs.count()

    val (g, tBuild) = Bench.time {
      val r = graft.sim.KnnGraph.run(spark, vecs, k = k, rounds = rounds)
      r.neighbors.count(); r
    }
    // candidate-pair upper bound the build paid per round: n·C(2k,2)
    val pairsPerRound = n.toDouble * (2 * k) * (2 * k - 1) / 2
    val rate = pairsPerRound * rounds / tBuild

    val queries = vecs.filter(pmod(col("vec_id"), lit(1000L)) === 0)
    val (hits, tSearch) = Bench.time {
      graft.sim.KnnGraph.search(vecs, g.neighbors, queries,
        k = k, beam = 2 * k, rounds = rounds).count()
    }
    println(s"""{"metric":"knn_probe","n":$n,"k":$k,"rounds":$rounds,""" +
      s""""build_sec":${f"$tBuild%.2f"},"pairs_per_sec":${f"$rate%.0f"},""" +
      s""""queries":${queries.count()},"search_sec":${f"$tSearch%.2f"},"hits":$hits}""")
    spark.stop()
  }
}

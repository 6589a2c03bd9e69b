package graft
import org.apache.spark.sql.functions._
/** One-off: candidate-pair volume + bucket-size profile of the minhash
  * LSH surface on the synthetic corpus (scale-point sizing).
  */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("GRAFT_SCALE_FACTOR", "1").toInt
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val c = corpus.CorpusGen.corpus(spark, 100000L * factor, seed = 42L,
      vertexScale = 40 * factor).localCheckpoint(true)
    val docs = c.select(xxhash64(col("path")).as("doc_id"),
      col("content").as("text")).localCheckpoint(true)
    c.unpersist()
    val n = docs.count()
    val cands = dedup.Dedup.minHashCandidates(docs)
    val nc = cands.count()
    val sh = docs.select(avg(size(graft.dedup.Dedup.shingleHashes(col("text"), 5))).as("avgSh")).collect()(0).getDouble(0)
    println(s"""{"docs":$n,"cand_pairs":$nc,"avg_shingles":$sh}""")
    spark.stop()
  }
}

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps
object DbgSynth {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.buildSession("32")
    spark.sparkContext.setLogLevel("ERROR")
    val P = 32
    graft.algo.Superstep.withoutAQE(spark) {
    val v = 500000L
    def pick(k: Int) = {
      val r = pmod(xxhash64(col("id"), lit(k)), lit(1000000L)).cast("double") / 1e6
      floor(lit(v.toDouble) * r * r).cast("long")
    }
    val big = GraphOps.symmetrize(
      spark.range(10000000L).select(pick(1).as("src"), pick(2).as("dst"))
        .filter(col("src") =!= col("dst"))).localCheckpoint(true)
    def t[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"  $n%-16s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r }
    val e = t("repartition"){ val x = big.repartition(P, col("src")).persist(StorageLevel.MEMORY_AND_DISK); x.count(); x }
    val outDeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outDeg"))
    val verts = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
    var state = t("init_state"){ verts.join(outDeg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outDeg"), lit(0L)).as("outDeg"), lit(1.0/500000).as("rank"), lit(0.0).as("prev"))
      .repartition(P, col("id")).localCheckpoint(true) }
    for (i <- 1 to 3) {
      println(s"iter $i")
      val rankSlice = state.filter(col("outDeg") > 0)
        .select(col("id").as("src"), (col("rank")/col("outDeg")).as("c"))
      val contribs = e.join(rankSlice.hint("shuffle_hash"), Seq("src"))
        .select(col("dst"), col("c"))
        .groupBy(col("dst").as("id")).agg(sum(col("c")).as("contrib"))
      val next = state.join(contribs.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), col("outDeg"),
          (lit(0.15/500000) + lit(0.85)*coalesce(col("contrib"), lit(0.0))).as("rank"),
          col("rank").as("prev"))
      state = t("localCheckpoint"){ next.localCheckpoint(true) }
      t("agg"){ state.agg(max(abs(col("rank")-col("prev")))).first() }
    }
    if (sys.env.contains("DBG_EXPLAIN")) state.explain("formatted")
    }
    spark.stop()
  }
}

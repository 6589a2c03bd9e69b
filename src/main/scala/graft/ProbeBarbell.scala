package graft

import org.apache.spark.sql.functions._

import graft.algo.Matching

/** Scratch diagnostic for the barbell bisection (not driver surface). */
object ProbeBarbell {
  def main(args: Array[String]): Unit = {
    val spark = Bench.buildSession("2")
    import spark.implicits._
    val clique = for {
      b <- Seq(0L, 100L); i <- 0L until 6L; j <- (i + 1) until 6L
    } yield (b + i, b + j, 10L)
    val ew = (clique :+ ((5L, 100L, 1L))).toDF("src", "dst", "weight")

    var edges = ew
    for (lvl <- 1 to 2) {
      val (mapping, coarse) = Matching.coarsen(spark, edges, 2)
      println(s"== level $lvl mapping ==")
      mapping.orderBy("id").show(20, false)
      println(s"== level $lvl coarse ==")
      coarse.orderBy("src", "dst").show(20, false)
      edges = coarse.localCheckpoint(true)
      edges.count()
    }
    val seed = 0L
    val d = graft.algo.ShortestPaths.run(spark,
      graft.graph.GraphOps.symmetrize(edges), Seq(seed), 2)
    println("== dist ==")
    d.orderBy("id").show(20, false)
    spark.stop()
  }
}

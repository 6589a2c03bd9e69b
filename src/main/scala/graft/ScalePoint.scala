package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, PageRank, Superstep}
import graft.corpus.CorpusGen
import graft.dedup.Dedup
import graft.extract.Extractor
import graft.graph.GraphOps
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot

/** One-off 1× vs 10× scale point (VERDICT r4 next-round #5): the same
  * jobs at `GRAFT_SCALE_FACTOR` × the default bench size, so BASELINE.md
  * can publish an observed-scaling table instead of only arguing the
  * 100× design on plan shape. Prints ONE JSON line.
  *
  * Covered surfaces (the four most expensive plan families):
  *   corpus_gen / pipeline_normalize / graph_build  — the extract →
  *     M-1..M-7 chain at factor× files (vertexScale also scaled, so
  *     the vertex count and edge count grow ~linearly, keeping density
  *     — and therefore per-row work — comparable across factors);
  *   pagerank / connected_components               — supersteps over
  *     the factor×-sized corpus graph;
  *   dedup_minhash — MinHash-LSH near-dup over the corpus rows
  *     themselves (content column), so the document count actually
  *     scales with the factor (the sf parquet tables are fixed-size);
  *   knn_build — NN-Descent at factor× vectors (same k/rounds/dims as
  *     the Bench row).
  *
  * Steal jiffies are sampled around each entry like Bench, so each
  * published number carries the VM-noise context it was measured under.
  */
object ScalePoint {
  def main(args: Array[String]): Unit = {
    val factor = sys.env.getOrElse("GRAFT_SCALE_FACTOR", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.buildSession(cpus)
    val P = spark.sparkContext.defaultParallelism

    val baseFiles = sys.env.getOrElse("GRAFT_SCALE_BASE_FILES", "100000").toLong
    val nFiles = baseFiles * factor
    val vScale = 40 * factor
    val knnN = sys.env.getOrElse("GRAFT_SCALE_BASE_KNN", "25000").toLong * factor

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val steal = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def bench[T](name: String)(f: => T): T = {
      val (s0, j0) = Bench.cpuJiffies()
      val (r, dt) = Bench.time(f)
      val (s1, j1) = Bench.cpuJiffies()
      results += name -> dt
      steal += name -> (if (j1 > j0) 100.0 * (s1 - s0) / (j1 - j0) else -1.0)
      r
    }

    val c = bench("corpus_gen") {
      val c0 = CorpusGen.corpus(spark, nFiles, seed = 42L, vertexScale = vScale)
        .localCheckpoint(true)
      c0.count(); c0
    }
    val snap = bench("pipeline_normalize") {
      val out = Normalize.fullChain(
        Snapshot(Extractor.entities(c), Extractor.relationships(c)))
      extra += "entities" -> out.entities.count().toDouble
      extra += "snapshot_edges" -> out.edges.count().toDouble
      out
    }
    val g = bench("graph_build") {
      val gt = GraphOps.semanticGraph(snap)
      GraphOps.GraphTables(gt.vertices.localCheckpoint(true),
        gt.edges.localCheckpoint(true))
    }
    // at 10× the accumulated stage checkpoints are tens of GB in the
    // tmpfs-backed local dir (which shares the box's RAM) — free each
    // frame the moment its last consumer is done or the run OOMs
    Extractor.evictMarkers(c)
    Seq(snap.entities, snap.edges).foreach(Superstep.freeCheckpoint)
    val sym = GraphOps.symmetrize(g.edges).localCheckpoint(true)
    extra += "sym_edges" -> sym.count().toDouble

    val pr = bench("pagerank")(PageRank.run(spark, sym, P))
    extra += "pagerank_iterations" -> pr.iterations.toDouble
    extra += "pagerank_edges_per_sec" ->
      extra("sym_edges") * pr.iterations / results("pagerank")
    bench("connected_components")(
      ConnectedComponents.run(spark, g.edges, Some(g.vertices), P).count())
    Seq(sym, g.edges, g.vertices).foreach(Superstep.freeCheckpoint)

    // near-dup over the corpus rows themselves: content is the text,
    // path the id — the one input whose cardinality actually scales
    val docsLike = c.select(
      xxhash64(col("path")).as("doc_id"), col("content").as("text"))
      .localCheckpoint(true)
    extra += "dedup_docs" -> docsLike.count().toDouble
    Superstep.freeCheckpoint(c)
    bench("dedup_minhash")(
      Dedup.minHashNearDups(docsLike, threshold = 0.7).count())
    Superstep.freeCheckpoint(docsLike)

    val vecs = spark.range(knnN).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(32)),
        j => (pmod(xxhash64(col("id"), j, lit(7L)), lit(2000001L))
          .cast("double") / 1e6 - 1.0).cast("float")).as("embedding"))
      .localCheckpoint(true)
    vecs.count()
    extra += "knn_vectors" -> knnN.toDouble
    bench("knn_build")(
      graft.sim.KnnGraph.run(spark, vecs, k = 6, rounds = 2)
        .neighbors.count())

    val qs = (results ++ extra).map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val st = steal.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_point","factor":$factor,"files":$nFiles,""" +
      s""""cpus":"$cpus","queries":$qs,"steal_pct":$st}""")
    spark.stop()
  }
}

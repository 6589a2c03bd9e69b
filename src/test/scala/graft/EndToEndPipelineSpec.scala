package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{LabelPropagation, Modularity}
import graft.corpus.CorpusGen
import graft.graph.GraphOps

/** One-call lifecycle (Pipeline.run ≡ `graphrag-kg scrape --full` →
  * `validate`), checked end to end including the saved snapshot layout.
  */
class EndToEndPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Pipeline.run produces a validated, analyzable graph and saves snapshots") {
    val corpus = CorpusGen.corpus(spark, 250L)
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val r = Pipeline.run(spark, corpus, numPartitions = 8,
      checkpointDir = Some(s"$dir/ckpt"))

    // validation gate passes on the engine's own output
    assert(r.validation.passed, r.validation.toMarkdown)

    // graph analysis results are present and consistent
    val nVerts = r.pageRank.count()
    assert(nVerts > 50)
    assert(r.communities.count() == nVerts)
    assert(r.components.count() == nVerts)
    // dense small-world graphs legitimately collapse to few communities
    // under min-tie-break LPA; modularity of a single community is 0
    assert(r.communityCount >= 1)
    assert(r.modularity >= -0.5 && r.modularity <= 1.0)
    val rankSum = r.pageRank.agg(sum("rank")).first().getDouble(0)
    assert(math.abs(rankSum - 1.0) < 1e-9)

    // mention backfill + chunks connect
    assert(r.chunks.count() > 0)
    assert(r.mentionedIn.count() > 0)
    assert(r.glossaryLinks.count() > 0)

    // SUPPLEMENT structure is materialized and consistent
    assert(r.supplement.chapters.count() > 0)
    assert(r.supplement.inChapter.count() == 250L)
    assert(r.supplement.resources.count() > 0)
    assert(r.supplement.definitionNodes.count() > 0)
    assert(r.supplement.fromArticle.count() == r.chunks.count())
    // every chunk's FROM_ARTICLE target exists → orphan check is 0
    assert(r.validation.orphanChunks == 0)
    // references resolve to real articles, never self
    val selfRefs = r.supplement.references
      .filter(col("source_id") === col("target_id")).count()
    assert(selfRefs == 0)

    // durable checkpoints were written per algorithm
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/ckpt/pagerank/_LATEST")))

    // snapshot persistence round-trips
    Pipeline.save(r, s"$dir/out")
    val entities = spark.read.parquet(s"$dir/out/entities")
    assert(entities.count() == r.snapshot.entities.count())
    val report = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out/validation_report.md")))
    assert(report.contains("PASSED"))
  }

  test("refineCommunities opt-in: valid result, modularity never below raw LPA") {
    val corpus = CorpusGen.corpus(spark, 100L)
    val r = Pipeline.run(spark, corpus, numPartitions = 8,
      refineCommunities = true)
    assert(r.validation.passed, r.validation.toMarkdown)
    assert(r.communities.count() == r.pageRank.count())
    // the refined partition must score at least the unrefined LPA one
    val g = GraphOps.semanticGraph(r.snapshot)
    val lpa = LabelPropagation.run(spark, GraphOps.symmetrize(g.edges), 8).labels
    val qLpa = Modularity.modularity(GraphOps.undirectedPairs(g.edges), lpa)
    assert(r.modularity >= qLpa - 1e-9,
      s"refined modularity ${r.modularity} < LPA $qLpa")
  }

  test("round-3-final ops compose on real pipeline output") {
    import graft.algo.{Coreness, PartitionCompare}
    import graft.graph.Scan
    val corpus = CorpusGen.corpus(spark, 120L)
    val r = Pipeline.run(spark, corpus, numPartitions = 8)
    val g = GraphOps.semanticGraph(r.snapshot)
    val sym = GraphOps.symmetrize(g.edges).localCheckpoint(true)
    val nVerts = sym.select(col("src")).distinct().count()

    // coreness covers every non-isolated vertex, max >= 1
    val core = Coreness.run(spark, sym, numPartitions = 8).cache()
    assert(core.count() == nVerts)
    assert(core.agg(max(col("coreness"))).first().getLong(0) >= 1L)

    // community profile over the pipeline's own communities: volumes
    // must sum to 2m and every community must appear
    val prof = GraphOps.communityProfile(sym, r.communities
      .select(col("id"), col("community"))).cache()
    val m = GraphOps.undirectedPairs(sym).count()
    assert(prof.agg(sum(col("volume"))).first().getLong(0) == 2 * m)
    assert(prof.count() == r.communities.select(col("community")).distinct().count())

    // SCAN assigns every vertex exactly one role
    val roles = Scan.run(spark, sym, epsNum = 2, epsDenom = 5, mu = 3,
      numPartitions = 8)
    assert(roles.count() == nVerts)
    assert(roles.select(col("id")).distinct().count() == nVerts)

    // ARI of the partition with itself is exactly 1
    val self = PartitionCompare.ari(r.communities, r.communities).first()
    assert(self.getDouble(4) == 1.0)
    core.unpersist(); prof.unpersist()
  }
}

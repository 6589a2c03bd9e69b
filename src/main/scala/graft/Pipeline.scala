package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, LabelPropagation, Modularity, ModularityRefine, PageRank, Superstep}
import graft.api.ReadApi
import graft.chunking.Chunker
import graft.corpus.CorpusGen
import graft.extract.Extractor
import graft.graph.{GraphOps, Supplementary}
import graft.normalize.{GlossaryLinker, Normalize}
import graft.normalize.Normalize.Snapshot
import graft.validate.Validation

/** The end-to-end pipeline — the engine's equivalent of the reference's
  * `graphrag-kg scrape --full` lifecycle (scraper.py:472-554, SURVEY.md
  * §3.1), stage for stage:
  *
  *   1. corpus scan (replaces SCRAPE — no network)
  *   2. extraction (regex stand-in for the LLM EXTRACT stage)
  *   3. chunking + chunk repair (replaces `_run_chunk_repair`)
  *   4. backfills: MENTIONED_IN (J-4), APPLIES_TO (J-11), definitions (J-5)
  *   5. NORMALIZE: the 10-step chain (M-1…M-7)
  *   6. SUPPLEMENT: glossary links (DEFINES_CONCEPT)
  *   7. graph analysis: communities (LPA for Leiden), PageRank, CC,
  *      modularity — with optional durable checkpoints
  *   8. VALIDATE: full check suite + Markdown report
  *
  * Everything is DataFrames; each stage output can be persisted as a
  * table snapshot. A reference user's whole `scrape → validate` cycle
  * is this one call.
  */
object Pipeline {

  /** SUPPLEMENT stage outputs (supplementary.py:46-411): structural
    * node tables plus their relationship tables.
    */
  final case class Supplement(
      articles: DataFrame,
      chapters: DataFrame,
      inChapter: DataFrame,
      resources: DataFrame,
      definitionNodes: DataFrame,
      relevantTo: DataFrame,
      references: DataFrame,
      fromArticle: DataFrame)

  final case class Result(
      snapshot: Snapshot,
      chunks: DataFrame,
      mentionedIn: DataFrame,
      glossaryLinks: DataFrame,
      supplement: Supplement,
      communities: DataFrame,
      pageRank: DataFrame,
      components: DataFrame,
      modularity: Double,
      communityCount: Long,
      validation: Validation.Result)

  /** @param refineCommunities when true, follow LPA with a
    *   [[ModularityRefine]] local-move pass — the modularity-ascent half
    *   of the reference's Leiden detection — before materializing
    *   communities. Off by default: the LPA partition is the north-rule
    *   stand-in and the golden fixtures pin its exact labels.
    */
  def run(spark: SparkSession,
          corpus: DataFrame,
          numPartitions: Int = 32,
          checkpointDir: Option[String] = None,
          refineCommunities: Boolean = false): Result = {

    // 1-2. extraction over a materialized corpus
    val c = corpus.localCheckpoint(true)
    val extracted = Snapshot(Extractor.entities(c), Extractor.relationships(c))
    val definitions = Extractor.definitions(c)

    // 3. chunking + repair
    val rawChunks = Chunker.chunk(c.select(col("path"), col("content")), "path", "content")

    // 5. normalization chain (includes the J-11 APPLIES_TO backfill)
    val normalized = Normalize.fullChain(extracted)

    // 4. backfills on the normalized snapshot
    val mentionedIn = Chunker.backfillMentionedIn(rawChunks, normalized.entities)
      .localCheckpoint(true)
    val chunks = Chunker.repairChunks(rawChunks, mentionedIn).localCheckpoint(true)
    val withDefs = Snapshot(
      GlossaryLinker.backfillDefinitions(normalized.entities, definitions)
        .localCheckpoint(true),
      normalized.edges)

    // 6. SUPPLEMENT: glossary → concept links + the structural tables
    //    (Chapter/Resource/Definition nodes, IN_CHAPTER / HAS_* /
    //    RELEVANT_TO / REFERENCES / FROM_ARTICLE edges)
    val glossary = GlossaryLinker.linkDefinitions(definitions, withDefs.entities)
      .localCheckpoint(true)
    val articles = Supplementary.articles(c).localCheckpoint(true)
    val supplement = Supplement(
      articles,
      Supplementary.chapters(articles),
      Supplementary.inChapter(articles),
      Supplementary.resources(articles),
      Supplementary.definitionNodes(definitions),
      Supplementary.relevantTo(c),
      Supplementary.articleReferences(articles, c.count()),
      Supplementary.fromArticle(chunks))

    // 7. graph analysis (reference post-processing Phase C)
    val g = GraphOps.semanticGraph(withDefs)
    val vertices = g.vertices.localCheckpoint(true)
    val edges = g.edges.localCheckpoint(true)
    val sym = GraphOps.symmetrize(edges)

    def ck(name: String) = checkpointDir.map(d => new Superstep(spark, s"$d/$name"))

    val lpa = LabelPropagation.run(spark, sym, numPartitions, ckpt = ck("lpa"))
    val labels =
      if (refineCommunities)
        ModularityRefine.run(spark, sym, lpa.labels, numPartitions).labels
      else lpa.labels
    val communities = labels.join(vertices, Seq("id"))
      .select(col("id"), col("name"), col("community")).localCheckpoint(true)
    val pr = PageRank.run(spark, sym, numPartitions, ckpt = ck("pagerank"))
    val ranks = pr.ranks.join(vertices, Seq("id"))
      .select(col("id"), col("name"), col("rank")).localCheckpoint(true)
    val cc = ConnectedComponents.run(spark, edges, Some(vertices), numPartitions,
        ckpt = ck("cc"))
      .join(vertices, Seq("id"))
      .select(col("id"), col("name"), col("component")).localCheckpoint(true)
    val mod = Modularity.modularity(GraphOps.undirectedPairs(edges),
      communities.select(col("id"), col("community")))

    // 8. validation (orphan check = the real FROM_ARTICLE anti-join)
    val validation = Validation.run(withDefs, Some(chunks), Some(mentionedIn),
      Some(articles))

    Result(withDefs, chunks, mentionedIn, glossary, supplement, communities,
      ranks, cc, mod,
      communities.select(col("community")).distinct().count(), validation)
  }

  /** Persist every output table under `dir` (parquet snapshot layout)
    * plus the validation report — the reference's Neo4j write-back +
    * Markdown report equivalents.
    */
  def save(r: Result, dir: String): Unit = {
    r.snapshot.entities.write.mode("overwrite").parquet(s"$dir/entities")
    r.snapshot.edges.write.mode("overwrite").parquet(s"$dir/edges")
    r.chunks.write.mode("overwrite").parquet(s"$dir/chunks")
    r.mentionedIn.write.mode("overwrite").parquet(s"$dir/mentioned_in")
    r.glossaryLinks.write.mode("overwrite").parquet(s"$dir/glossary_links")
    r.supplement.chapters.write.mode("overwrite").parquet(s"$dir/chapters")
    r.supplement.inChapter.write.mode("overwrite").parquet(s"$dir/in_chapter")
    r.supplement.resources.write.mode("overwrite").parquet(s"$dir/resources")
    r.supplement.definitionNodes.write.mode("overwrite").parquet(s"$dir/definitions")
    r.supplement.relevantTo.write.mode("overwrite").parquet(s"$dir/relevant_to")
    r.supplement.references.write.mode("overwrite").parquet(s"$dir/references")
    r.supplement.fromArticle.write.mode("overwrite").parquet(s"$dir/from_article")
    r.communities.write.mode("overwrite").parquet(s"$dir/communities")
    r.pageRank.write.mode("overwrite").parquet(s"$dir/pagerank")
    r.components.write.mode("overwrite").parquet(s"$dir/components")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/validation_report.md"),
      r.validation.toMarkdown.getBytes("UTF-8"))
  }
}

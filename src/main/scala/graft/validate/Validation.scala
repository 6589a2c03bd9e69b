package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model
import graft.normalize.{Normalize, Vocab}
import graft.normalize.Normalize.Snapshot

/** The reference's validation suite (validation/queries.py:614-702) as
  * DataFrame checks over the snapshot tables, plus the Markdown report
  * (reporter.py:24-120) and the 6-way pass gate (queries.py:679-688).
  */
object Validation {

  final case class Result(
      orphanChunks: Long,
      duplicateEntities: Long,
      industryCount: Long,
      invalidPatterns: Long,
      missingChunkIds: Long,
      missingChunkIndex: Long,
      pluralDuplicates: Long,
      genericEntities: Long,
      degenerateChunks: Long,
      mislabeledChallenges: Long,
      nearDuplicates: Long,
      ghostEntities: Long,
      entityStats: Seq[(String, Long, Long)]) {

    /** queries.py:679-688 — AND of the six critical checks. */
    def passed: Boolean =
      orphanChunks == 0 && duplicateEntities == 0 && industryCount <= 19 &&
        missingChunkIds == 0 && missingChunkIndex == 0 && pluralDuplicates == 0

    /** reporter.py:41-120-shaped Markdown. */
    def toMarkdown: String = {
      def flag(ok: Boolean) = if (ok) "✅" else "❌"
      val stats = entityStats.map { case (l, t, n) => s"| $l | $t | $n |" }.mkString("\n")
      s"""# Validation Report
         |
         |**Status: ${if (passed) "PASSED" else "FAILED"}**
         |
         |## Critical checks
         || check | value | pass |
         ||---|---|---|
         || orphan chunks | $orphanChunks | ${flag(orphanChunks == 0)} |
         || duplicate (label,name) entities | $duplicateEntities | ${flag(duplicateEntities == 0)} |
         || industry count ≤ 19 | $industryCount | ${flag(industryCount <= 19)} |
         || missing chunk_ids | $missingChunkIds | ${flag(missingChunkIds == 0)} |
         || missing chunk index | $missingChunkIndex | ${flag(missingChunkIndex == 0)} |
         || plural/singular duplicates | $pluralDuplicates | ${flag(pluralDuplicates == 0)} |
         |
         |## Advisory checks
         || check | value |
         ||---|---|
         || generic entities | $genericEntities |
         || degenerate chunks | $degenerateChunks |
         || invalid (src,rel,dst) patterns | $invalidPatterns |
         || potentially mislabeled challenges | $mislabeledChallenges |
         || near-duplicate entities | $nearDuplicates |
         || ghost entities (MENTIONED_IN only) | $ghostEntities |
         |
         |## Entity stats (label, total, normalized)
         || label | total | normalized |
         ||---|---|---|
         |$stats
         |""".stripMargin
    }
  }

  /** Duplicate (label, name) groups — A-1 (queries.py:91-106). */
  def duplicateEntities(entities: DataFrame): DataFrame =
    entities.groupBy(col("label"), col("name")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Dynamic plural/singular pairs — J-2 (queries.py:246-296). */
  def pluralSingularPairs(entities: DataFrame): DataFrame = {
    val singular = entities
      .filter(col("name").isNotNull && !col("name").endsWith("s"))
      .select(concat(col("name"), lit("s")).as("name"), col("label"),
        col("name").as("singular_name"))
    entities.select(col("name"), col("label"))
      .join(singular, Seq("name", "label"))
      .select(col("label"), col("singular_name"), col("name").as("plural_name"))
  }

  /** Invalid (srcLabel, relType, dstLabel) triples — J-10
    * (queries.py:173-204): typed edges anti-joined against the ~50
    * PATTERNS, broadcast.
    */
  def invalidPatterns(s: Snapshot): DataFrame = {
    val spark = s.entities.sparkSession
    val patterns = broadcast(
      spark.createDataFrame(model.ValidPatterns)
        .toDF("srcLabel", "relType", "dstLabel"))
    val labels = s.entities.select(col("id"), col("label"))
    s.edges
      .join(labels.select(col("id").as("src"), col("label").as("srcLabel")), Seq("src"))
      .join(labels.select(col("id").as("dst"), col("label").as("dstLabel")), Seq("dst"))
      .join(patterns, Seq("srcLabel", "relType", "dstLabel"), "left_anti")
      .groupBy(col("srcLabel"), col("relType"), col("dstLabel"))
      .agg(count(lit(1)).as("violations"))
  }

  /** Near-duplicate entities — J-3 theta join (queries.py:535-559):
    * same label, b.name contains a.name, length gap ≤ 5, a.name > 4
    * chars, id(a) < id(b).
    *
    * Blocked EXACTLY (VERDICT r1: label-only equi-keys — 12 values —
    * are a per-label near-cartesian at 10^8 entities): containment with
    * a length gap ≤ 5 implies (1) floor(len(a)/6) ∈ {floor(len(b)/6)−1,
    * floor(len(b)/6)} and (2) a's first 4 chars (a has > 4) equal one of
    * b's 4-grams. Joining on (label, lenBand, 4-gram) loses no pairs —
    * both implications are necessary conditions — and replicates b only
    * ~2·len(b) times, a constant; the θ-predicates verify candidates.
    */
  def nearDuplicateEntities(entities: DataFrame): DataFrame = {
    val e = entities.select(col("id"), col("name"), col("label"))
      .filter(col("name").isNotNull)
    val a = e.filter(length(col("name")) > 4)
      .select(col("id").as("aId"), col("name").as("aName"), col("label"),
        floor(length(col("name")) / 6).as("lenBand"),
        substring(col("name"), 1, 4).as("gram"))
    val b = e
      .select(col("id").as("bId"), col("name").as("bName"), col("label"),
        explode(array(floor(length(col("name")) / 6),
          floor(length(col("name")) / 6) - 1)).as("lenBand"),
        col("name"))
      .select(col("bId"), col("bName"), col("label"), col("lenBand"),
        explode(transform(sequence(lit(1), greatest(length(col("name")) - 3, lit(1))),
          i => col("name").substr(i, lit(4)))).as("gram"))
    a.join(b, Seq("label", "lenBand", "gram"))
      .filter(col("aId") < col("bId") &&
        col("bName").contains(col("aName")) &&
        length(col("bName")) - length(col("aName")) <= 5 &&
        col("aName") =!= col("bName"))
      // a pair can match several grams/bands: dedupe per id-pair so the
      // output multiplicity matches the reference's un-blocked join
      .dropDuplicates("aId", "bId")
      .select(col("label"), col("aName").as("a"), col("bName").as("b"))
  }

  /** Ghost entities — J-8 (queries.py:476-506): entities whose only
    * relationships are MENTIONED_IN (no semantic edges either way).
    */
  def ghostEntities(s: Snapshot, mentionedIn: DataFrame): DataFrame = {
    val sem = s.edges.filter(col("relType") =!= "MENTIONED_IN")
    s.entities
      .join(sem.select(col("src").as("id")), Seq("id"), "left_anti")
      .join(sem.select(col("dst").as("id")), Seq("id"), "left_anti")
      .join(mentionedIn.select(col("entity_id").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id"), col("name"), col("label"))
  }

  /** Potentially mislabeled Challenges — O-6, Cypher-path semantics
    * (ANY word in POSITIVE_OUTCOME_WORDS, queries.py:521-526 — note the
    * deliberate divergence from the Python first-word path, preserved
    * per SURVEY.md O-6).
    */
  def mislabeledChallenges(entities: DataFrame): DataFrame =
    entities.filter(col("label") === "Challenge" &&
      arrays_overlap(split(lower(col("name")), " "),
        typedLit(Vocab.PositiveOutcomeWords.toSeq.sorted)))

  /** Orphan entities (queries.py:64-83): entity-label nodes with no
    * relationship in either direction (`NOT (n)--()`).
    */
  def orphanEntities(s: Snapshot): DataFrame =
    s.entities
      .join(s.edges.select(col("src").as("id")), Seq("id"), "left_anti")
      .join(s.edges.select(col("dst").as("id")), Seq("id"), "left_anti")
      .select(col("label"), col("name"))

  /** Article coverage (queries.py:206-229): total articles + number of
    * chapters that have at least one.
    */
  def articleCoverage(articles: DataFrame): DataFrame =
    articles.agg(count(lit(1)).as("total_articles"),
      countDistinct(col("repo")).as("chapters_with_articles"))

  /** A-3: per-label total vs normalized-name counts (normalizer.py:590-604). */
  def entityStats(entities: DataFrame): DataFrame =
    entities
      .groupBy(col("label"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("name") === lower(trim(col("name"))), 1).otherwise(0))
          .cast("long").as("normalized"))
      .orderBy(col("label"))

  /** (label, name) group table feeding the one-pass rollups. */
  private def groupTable(entities: DataFrame): DataFrame =
    entities.groupBy(col("label"), col("name")).agg(count(lit(1)).as("cnt"))

  /** One-pass entity-side rollup (VERDICT r2 #7): ONE (label, name)
    * aggregation feeds the duplicate-group, industry, generic,
    * mislabeled AND plural-pair counts — conditional sums over group
    * counts are exactly the row-level counts, and the plural/singular
    * pair multiplicity is Σ cnt(plural)·cnt(singular) over the (much
    * smaller) group table. One shuffle + two tiny aggregations instead
    * of five full entity scans; per-check values identical to the
    * standalone check DataFrames above.
    */
  def entityRollup(entities: DataFrame): DataFrame =
    rollupOfGroups(groupTable(entities))

  private def rollupOfGroups(g: DataFrame): DataFrame = {
    val entityAgg = g.agg(
      coalesce(sum(when(col("cnt") > 1, 1L)), lit(0L)).as("dup_groups"),
      coalesce(sum(when(col("label") === "Industry", col("cnt"))), lit(0L))
        .as("industry_count"),
      coalesce(sum(when(lower(col("name")).isin(Vocab.GenericTermsToDelete.toSeq: _*),
        col("cnt"))), lit(0L)).as("generic_entities"),
      coalesce(sum(when(col("label") === "Challenge" &&
        arrays_overlap(split(lower(col("name")), " "),
          typedLit(Vocab.PositiveOutcomeWords.toSeq.sorted)),
        col("cnt"))), lit(0L)).as("mislabeled_challenges"))
    val pluralAgg = {
      val singular = g.filter(col("name").isNotNull && !col("name").endsWith("s"))
        .select(concat(col("name"), lit("s")).as("name"), col("label"),
          col("cnt").as("sCnt"))
      g.join(singular, Seq("name", "label"))
        .agg(coalesce(sum(col("cnt") * col("sCnt")), lit(0L)).as("plural_pairs"))
    }
    entityAgg.crossJoin(pluralAgg)
  }

  /** get_chunk_article_mapping (validation/queries.py:587-612): chunks
    * still missing a chunk_id, with their article and index — the
    * worklist M-12 chunk_id synthesis consumes. Neo4j's elementId(c)
    * has no Spark analog; the deterministic surrogate is
    * article_id#index (unique per chunk by construction). Top-`limit`
    * by (article_id, chunk_index), matching the reference's ORDER BY +
    * LIMIT — a TakeOrderedAndProject, no full sort at scale.
    */
  def chunkArticleMapping(chunks: DataFrame, limit: Int = 100): DataFrame =
    chunks.filter(col("chunk_id").isNull)
      .select(
        concat(col("article_id"), lit("#"), col("chunk_index"))
          .as("chunk_element_id"),
        col("article_id"), col("chunk_index"))
      .orderBy(col("article_id"), col("chunk_index"))
      .limit(limit)

  /** Run everything (chunks/mentionedIn/articles optional). With an
    * article table present, the orphan-chunk check (queries.py:53-57)
    * is the real FROM_ARTICLE anti-join via Supplementary; without it,
    * the degenerate null-article fallback.
    */
  def run(s: Snapshot,
          chunks: Option[DataFrame] = None,
          mentionedIn: Option[DataFrame] = None,
          articles: Option[DataFrame] = None): Result = {
    val emptyMi = s.entities.sparkSession.emptyDataFrame
      .withColumn("entity_id", lit(0L)).withColumn("chunk_id", lit("")).limit(0)
    val mi = mentionedIn.getOrElse(emptyMi)

    val orphan = (chunks, articles) match {
      case (Some(c), Some(a)) =>
        graft.graph.Supplementary.orphanChunks(c, a).count()
      case (Some(c), None) => c.filter(col("article_id").isNull).count()
      case _ => 0L
    }
    // chunk-side checks: one aggregation pass instead of three filtered
    // counts (each was a full scan of the chunk table)
    val (missingIds, missingIdx, degenerate) = chunks.map { c =>
      val r = c.agg(
        coalesce(sum(when(col("chunk_id").isNull, 1L)), lit(0L)),
        coalesce(sum(when(col("chunk_index").isNull, 1L)), lit(0L)),
        coalesce(sum(when(col("n_chars") < 100, 1L)), lit(0L))).first()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }.getOrElse((0L, 0L, 0L))

    // entity-side checks: the shared one-pass rollup over a checkpointed
    // (label, name) group table (also reused by entityStats below)
    val g = groupTable(s.entities).localCheckpoint(false)
    val e = rollupOfGroups(g).first()

    Result(
      orphanChunks = orphan,
      duplicateEntities = e.getLong(0),
      industryCount = e.getLong(1),
      invalidPatterns = invalidPatterns(s).agg(sum(col("violations"))).first() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      },
      missingChunkIds = missingIds,
      missingChunkIndex = missingIdx,
      pluralDuplicates = e.getLong(4),
      genericEntities = e.getLong(2),
      degenerateChunks = degenerate,
      mislabeledChallenges = e.getLong(3),
      nearDuplicates = nearDuplicateEntities(s.entities).count(),
      ghostEntities = ghostEntities(s, mi).count(),
      entityStats = g.groupBy(col("label"))
        .agg(sum(col("cnt")).cast("long").as("total"),
          coalesce(sum(when(col("name") === lower(trim(col("name"))), col("cnt"))),
            lit(0L)).cast("long").as("normalized"))
        .orderBy(col("label")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}

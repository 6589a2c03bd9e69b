package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.chunking.Chunker
import graft.normalize.{GlossaryLinker, Normalize, Vocab}
import graft.normalize.Normalize.Snapshot

/** The reference's `ValidationFixer.apply_all_fixes` orchestrator
  * (validation/fixes.py:666-734): the nine repair operations in the
  * reference's fixed order, each returning per-fix stats, over pure
  * snapshot tables (no in-place mutation — every step maps a FixState
  * to a new one).
  *
  * Order of operations (fixes.py:669-678):
  *   1. delete degenerate chunks          (fixes.py:35-94)
  *   2. re-index remaining chunks         (fixes.py:97-158)
  *   3. generate chunk_ids from indices   (fixes.py:438-507)
  *   4. fix truncated webinar titles      (fixes.py:161-230)
  *   5. relabel mislabeled entities       (fixes.py:233-315)
  *   6. backfill MENTIONED_IN             (fixes.py:318-366)
  *   7. backfill missing definitions      (fixes.py:369-435)
  *   8. delete generic entities           (fixes.py:550-587)
  *   9. merge plural entities             (fixes.py:510-547)
  *
  * Each step runs one count action for its stats (the reference runs a
  * count query per fix too); the data-shaping itself is lazy DataFrame
  * work, so at cluster scale the per-step actions are skinny count jobs
  * over the already-partitioned snapshot, not extra full passes.
  */
object Fixes {

  /** The mutable-graph surface the fixer touches, as immutable tables.
    *
    * `chunks` must carry a stable `chunk_uid` column — the engine's
    * stand-in for Neo4j's elementId insertion-order surrogate that
    * fixes.py:140 sorts by (the reference itself documents elementId
    * ordering as best-effort).
    *
    * PRECONDITION (ADVICE r2): `snapshot.entities` must be unique per
    * (name, label) — the post-M-2 invariant every extractor-produced
    * snapshot satisfies. Fix 5's relabel collision check runs against
    * the Concept names computed ONCE; the reference relabels rows
    * sequentially, so with two same-name Challenge rows (impossible
    * under the invariant) the first relabel would block the second
    * there but not here.
    */
  final case class FixState(
      snapshot: Snapshot,
      chunks: DataFrame,      // (chunk_uid, article_id, chunk_id, chunk_index, text, n_chars)
      webinars: DataFrame,    // (webinar_id, title, description, url)
      definitions: DataFrame, // (term, definition)
      mentionedIn: DataFrame) // (entity_id, chunk_id)

  final case class FixStat(fix: String, found: Long, applied: Long)

  // ── step 4 kernel: the true M-13 rule chain (fixes.py:200-218) ──

  /** Title needs repair when null, shorter than 15 chars, or the literal
    * placeholder 'Webinar' (fixes.py:186-188).
    */
  def webinarTitleNeedsRepair(title: Column): Column =
    title.isNull || length(title) < 15 || title === "Webinar"

  /** The repaired title: first sentence of the description
    * (`left(desc, indexOf(desc, '.') + 1)` — through the period), else
    * first 100 chars, else 'Webinar: ' + URL slug with '-'→' '
    * (fixes.py:203-215).
    */
  def repairedWebinarTitle(title: Column, description: Column, url: Column): Column = {
    val fromDesc = description.isNotNull && length(description) > 15
    val firstSentence = when(description.contains("."),
        description.substr(lit(1), locate(".", description)))
      .otherwise(substring(description, 1, 100))
    val slug = concat(lit("Webinar: "),
      regexp_replace(element_at(split(coalesce(url, lit("unknown")), "/"), -1), "-", " "))
    when(!webinarTitleNeedsRepair(title), title)
      .when(fromDesc, firstSentence)
      .otherwise(slug)
  }

  /** `preview_all_fixes` (fixes.py:613-664): the would-fix counts of
    * every step, computed without touching the state — the
    * `validate` (no `--fix`) user journey. Keys match the reference's
    * summary dict.
    */
  def previewAllFixes(state: FixState): Map[String, Long] = {
    val mentionedChunks = state.mentionedIn.select(col("chunk_id")).distinct()
    val degenerate = state.chunks
      .filter(col("text").isNotNull && length(col("text")) < Chunker.MinChunk)
      .join(mentionedChunks, Seq("chunk_id"), "left_anti").count()
    val entities = state.snapshot.entities
    val mislabeled = entities.filter(
      col("label") === "Challenge" && col("name").isNotNull &&
        arrays_overlap(split(lower(col("name")), " "),
          typedLit(Vocab.PositiveOutcomeWords.toSeq.sorted))).count()
    val withoutMention = entities
      .filter(col("label").isin("Standard", "Industry"))
      .join(state.mentionedIn.select(col("entity_id").as("id")).distinct(),
        Seq("id"), "left_anti").count()
    Map(
      "degenerate_chunks_to_delete" -> degenerate,
      "chunk_indices_to_fix" -> state.chunks.filter(col("chunk_index").isNull).count(),
      "chunk_ids_to_fix" -> state.chunks.filter(col("chunk_id").isNull).count(),
      "webinar_titles_to_fix" ->
        state.webinars.filter(webinarTitleNeedsRepair(col("title"))).count(),
      "mislabeled_to_fix" -> mislabeled,
      "mentioned_in_estimate" -> withoutMention,
      "definitions_to_backfill" -> entities
        .filter(col("definition").isNull || col("definition") === "").count(),
      "entities_to_delete" -> entities
        .filter(lower(col("name")).isin(Vocab.GenericTermsToDelete.toSeq: _*)).count(),
      "entities_to_merge" -> Validation.pluralSingularPairs(entities).count())
  }

  /** Apply all nine fixes in reference order. Returns the repaired state
    * plus one FixStat per step (found = the reference's pre-count,
    * applied = rows actually changed).
    */
  def applyAllFixes(state: FixState): (FixState, Seq[FixStat]) = {
    val stats = Seq.newBuilder[FixStat]

    // ── 1. delete degenerate chunks (text < 100 chars, no MENTIONED_IN) ──
    val mentionedChunks = state.mentionedIn.select(col("chunk_id")).distinct()
    val degenerate = state.chunks
      .filter(col("text").isNotNull && length(col("text")) < Chunker.MinChunk)
      .join(mentionedChunks, Seq("chunk_id"), "left_anti")
      .select(col("chunk_uid"))
    val nDegenerate = degenerate.count()
    val chunks1 = state.chunks.join(degenerate, Seq("chunk_uid"), "left_anti")
      .localCheckpoint(true)
    stats += FixStat("degenerate_chunks", nDegenerate, nDegenerate)

    // ── 2. re-index chunks missing chunk_index ──
    // The reference assigns 0..k-1 over ONLY the null-index chunks of
    // each article, ordered by elementId (fixes.py:137-146) — preserved
    // literally, chunk_uid standing in for elementId.
    val nMissingIdx = chunks1.filter(col("chunk_index").isNull).count()
    val wIdx = Window.partitionBy(col("article_id")).orderBy(col("chunk_uid"))
    val chunks2 = (if (nMissingIdx == 0) chunks1
      else {
        val repaired = chunks1.filter(col("chunk_index").isNull)
          .withColumn("chunk_index", row_number().over(wIdx) - 1)
        chunks1.filter(col("chunk_index").isNotNull).unionByName(repaired)
      }).localCheckpoint(true)
    stats += FixStat("chunk_index", nMissingIdx, nMissingIdx)

    // ── 3. synthesize missing chunk_ids: {article_id}_chunk_{idx:04d} ──
    // right('000' + idx, 4) per fixes.py:492 (truncates above 9999,
    // like the reference).
    val nMissingIds = chunks2.filter(col("chunk_id").isNull).count()
    val chunks3 = chunks2.withColumn("chunk_id",
      when(col("chunk_id").isNull,
        concat(col("article_id"), lit("_chunk_"),
          substring(concat(lit("000"),
            coalesce(col("chunk_index"), lit(0)).cast("string")), -4, 4)))
        .otherwise(col("chunk_id")))
      .localCheckpoint(true)
    stats += FixStat("chunk_ids", nMissingIds, nMissingIds)

    // ── 4. fix truncated webinar titles ──
    val nBadTitles = state.webinars.filter(webinarTitleNeedsRepair(col("title"))).count()
    val webinars4 = state.webinars
      .withColumn("title",
        repairedWebinarTitle(col("title"), col("description"), col("url")))
      .localCheckpoint(true)
    stats += FixStat("webinar_titles", nBadTitles, nBadTitles)

    // ── 5. relabel mislabeled Challenges (ANY-word Cypher-path
    //      semantics, fixes.py:265-271; collision-checked per
    //      fixes.py:283-291) ──
    val entities = state.snapshot.entities
    val isMislabeled = col("label") === "Challenge" && col("name").isNotNull &&
      arrays_overlap(split(lower(col("name")), " "),
        typedLit(Vocab.PositiveOutcomeWords.toSeq.sorted))
    val conceptNames = entities.filter(col("label") === "Concept")
      .select(col("name")).distinct().withColumn("__collides", lit(true))
    val flagged = entities.join(conceptNames, Seq("name"), "left")
      .withColumn("__mislabeled", isMislabeled)
    val nFound5 = flagged.filter(col("__mislabeled")).count()
    val nSkipped5 = flagged.filter(col("__mislabeled") && col("__collides")).count()
    val entities5 = flagged
      .withColumn("label",
        when(col("__mislabeled") && col("__collides").isNull, "Concept")
          .otherwise(col("label")))
      .drop("__collides", "__mislabeled")
      .localCheckpoint(true)
    stats += FixStat("mislabeled_entities", nFound5, nFound5 - nSkipped5)

    // ── 6. backfill MENTIONED_IN (+ APPLIES_TO, fixes.py:358-360) ──
    val snap5 = Snapshot(entities5, state.snapshot.edges)
    val backfilled = Chunker.backfillMentionedIn(chunks3, entities5)
    val newMentions = backfilled.join(state.mentionedIn,
      Seq("entity_id", "chunk_id"), "left_anti")
    val nNewMentions = newMentions.count()
    val mentionedIn6 = state.mentionedIn.unionByName(newMentions).localCheckpoint(true)
    val snap6 = Normalize.backfillAppliesTo(snap5)
    stats += FixStat("mentioned_in", nNewMentions, nNewMentions)

    // ── 7. backfill missing definitions from the glossary ──
    val nMissingDefs = snap6.entities
      .filter(col("definition").isNull || col("definition") === "").count()
    val entities7 = GlossaryLinker.backfillDefinitions(snap6.entities, state.definitions)
      .localCheckpoint(true)
    val nBackfilled = if (nMissingDefs == 0) 0L else nMissingDefs -
      entities7.filter(col("definition").isNull || col("definition") === "").count()
    stats += FixStat("definitions", nMissingDefs, nBackfilled)

    // ── 8. delete generic entities ──
    val snap7 = Snapshot(entities7, snap6.edges)
    val nGeneric = entities7
      .filter(lower(col("name")).isin(Vocab.GenericTermsToDelete.toSeq: _*)).count()
    val snap8 = Normalize.materialize(Normalize.m4DeleteGeneric(snap7))
    stats += FixStat("generic_entities", nGeneric, nGeneric)

    // ── 9. merge plural entities ──
    val nPlural = Validation.pluralSingularPairs(snap8.entities).count()
    val snap9 = Normalize.materialize(Normalize.m5MergePlurals(snap8))
    stats += FixStat("plural_entities", nPlural, nPlural)

    (FixState(snap9, chunks3, webinars4, state.definitions, mentionedIn6),
      stats.result())
  }

  /** Stats as a DataFrame (fix, found, applied) for the driver surface. */
  def statsDF(spark: org.apache.spark.sql.SparkSession,
              stats: Seq[FixStat]): DataFrame = {
    import spark.implicits._
    stats.toDF("fix", "found", "applied")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Supplementary
import graft.normalize.Normalize
import graft.normalize.Normalize.Snapshot
import graft.validate.{Fixes, Validation}
import graft.validate.Fixes.FixState

/** SUPPLEMENT stage (supplementary.py:46-411) and the apply_all_fixes
  * orchestrator (fixes.py:666-734) on hand-built dirty fixtures.
  */
class SupplementFixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def entitiesDF(rows: Seq[(Long, String, String, Option[String])]) =
    rows.map { case (id, n, l, d) =>
      (id, n, Option.empty[String], l, d, Seq.empty[String], Seq.empty[String])
    }.toDF("id", "name", "displayName", "label", "definition", "aliases", "sourceSpans")

  test("webinar title repair follows the fixes.py:200-218 rule chain") {
    val web = Seq(
      // (title, description, url)
      ("A perfectly fine title", "ignored. yes", "https://x/last-seg"),
      (null, "First sentence here. And the rest", "https://x/a-b"),
      (null, "No period in this description at all but long", "https://x/a-b"),
      ("Webinar", "short", "https://x/great-intro-session"),
      ("short", null, null)
    ).toDF("title", "description", "url")
    val out = web.select(
      Fixes.repairedWebinarTitle(col("title"), col("description"), col("url"))
        .as("t")).collect().map(_.getString(0))
    assert(out(0) == "A perfectly fine title")
    assert(out(1) == "First sentence here.") // through the '.' inclusive
    assert(out(2) == "No period in this description at all but long") // < 100 chars
    assert(out(3) == "Webinar: great intro session")
    assert(out(4) == "Webinar: unknown")
  }

  test("parseFragments: JSON array → trimmed items; ' | ' split; singleton") {
    val in = Seq(
      """["a","  b  ",""]""", // JSON array: trim, drop empties
      "x | y",               // delimiter split
      "123",                 // valid JSON, not an array → singleton
      "plain text"           // not JSON → singleton
    ).toDF("desc")
    val out = in.select(Normalize.parseFragments(col("desc")).as("f"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("a", "b"))
    assert(out(1) == List("x", "y"))
    assert(out(2) == List("123"))
    assert(out(3) == List("plain text"))
  }

  test("applyAllFixes runs the 9 reference-order steps with correct stats") {
    val entities = entitiesDF(Seq(
      // ANY-word mislabel (Cypher path): 'satisfaction' is positive but
      // NOT the first word — fixes.py:265-271 still relabels
      (1L, "delivering customer satisfaction", "Challenge", None),
      // mislabel with an existing Concept of the same name → collision skip
      (2L, "better outcomes", "Challenge", None),
      (3L, "better outcomes", "Concept", Some("already here")),
      (4L, "tool", "Tool", None),                 // generic → deleted
      (5L, "requirement", "Concept", None),       // plural-merge target
      (6L, "requirements", "Concept", None),      // plural → merged into 5
      (7L, "iso 26262", "Standard", None)))       // gets definition + mention
    val edges = Seq((6L, 7L, "RELATED_TO"), (1L, 5L, "ADDRESSES"))
      .toDF("src", "dst", "relType")

    val longText = "iso 26262 requires traceability evidence " * 5 // > 100 chars
    val chunks = Seq(
      // (chunk_uid, article_id, chunk_id, chunk_index, text)
      ("a#0", "a", "a_chunk_0000", Some(0), longText),
      ("a#1", "a", "a_chunk_0001", Some(1), "tiny"), // degenerate → deleted
      ("b#0", "b", null, None, longText))            // null index + null id
      .map { case (u, a, cid, idx, txt) => (u, a, Option(cid), idx, txt, txt.length) }
      .toDF("chunk_uid", "article_id", "chunk_id", "chunk_index", "text", "n_chars")

    val webinars = Seq(("w1", "Webinar", "Recorded deep dive. More detail", "https://x/s-1"))
      .toDF("webinar_id", "title", "description", "url")
    val definitions = Seq(("ISO 26262", "road vehicle functional safety standard"))
      .toDF("term", "definition")
    val emptyMi = Seq.empty[(Long, String)].toDF("entity_id", "chunk_id")

    // dry-run preview (fixes.py:613-664) sees the same work without
    // touching the state
    val preview = Fixes.previewAllFixes(
      FixState(Snapshot(entities, edges), chunks, webinars, definitions, emptyMi))
    assert(preview("degenerate_chunks_to_delete") == 1)
    assert(preview("chunk_indices_to_fix") == 1)
    assert(preview("chunk_ids_to_fix") == 1)
    assert(preview("webinar_titles_to_fix") == 1)
    assert(preview("mislabeled_to_fix") == 2)
    assert(preview("mentioned_in_estimate") == 1) // iso 26262 unmentioned
    assert(preview("definitions_to_backfill") == 6)
    assert(preview("entities_to_delete") == 1)
    assert(preview("entities_to_merge") == 1)

    val (state, stats) = Fixes.applyAllFixes(
      FixState(Snapshot(entities, edges), chunks, webinars, definitions, emptyMi))

    assert(stats.map(_.fix) == Seq("degenerate_chunks", "chunk_index", "chunk_ids",
      "webinar_titles", "mislabeled_entities", "mentioned_in", "definitions",
      "generic_entities", "plural_entities"))
    val byName = stats.map(s => s.fix -> s).toMap
    assert(byName("degenerate_chunks").applied == 1)
    assert(byName("chunk_index").applied == 1)
    assert(byName("chunk_ids").applied == 1)
    assert(byName("webinar_titles").applied == 1)
    assert(byName("mislabeled_entities").found == 2)
    assert(byName("mislabeled_entities").applied == 1) // collision skipped
    assert(byName("mentioned_in").applied >= 1)        // iso 26262 in chunk text
    assert(byName("definitions").applied >= 1)
    assert(byName("generic_entities").applied == 1)
    assert(byName("plural_entities").applied == 1)

    val ents = state.snapshot.entities.select("id", "name", "label", "definition")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap
    assert(ents(1L)._2 == "Concept")            // relabeled
    assert(ents(2L)._2 == "Challenge")          // collision kept
    assert(!ents.contains(4L))                  // generic deleted
    assert(!ents.contains(6L))                  // plural merged away
    assert(ents(7L)._3 == "road vehicle functional safety standard")
    // plural merge transferred the edge 6→7 onto the singular 5
    val es = state.snapshot.edges.select("src", "dst", "relType").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(es.contains((5L, 7L, "RELATED_TO")))

    // repaired chunk table: no nulls, no degenerates
    assert(state.chunks.filter(col("chunk_id").isNull ||
      col("chunk_index").isNull).count() == 0)
    assert(state.chunks.filter(col("n_chars") < 100).count() == 0)
    assert(state.chunks.filter(col("chunk_uid") === "b#0")
      .select("chunk_id").head().getString(0) == "b_chunk_0000")

    // the repaired state passes the reference's 6-way gate with the real
    // FROM_ARTICLE orphan check
    val articles = Seq("a", "b").toDF("article_id")
    val r = Validation.run(state.snapshot, Some(state.chunks),
      Some(state.mentionedIn), Some(articles))
    assert(r.passed, r.toMarkdown)
  }

  test("orphan-chunk validation is a real FROM_ARTICLE anti-join") {
    val chunks = Seq(
      ("a", "a_chunk_0000", 0, "x" * 120, 120),
      ("ghost", "ghost_chunk_0000", 0, "y" * 120, 120))
      .toDF("article_id", "chunk_id", "chunk_index", "text", "n_chars")
    val articles = Seq("a").toDF("article_id")
    val orphans = Supplementary.orphanChunks(chunks, articles).collect()
    assert(orphans.map(_.getString(1)).toSet == Set("ghost_chunk_0000"))
    val snap = Snapshot(entitiesDF(Seq((1L, "x y", "Concept", None))),
      Seq.empty[(Long, Long, String)].toDF("src", "dst", "relType"))
    val r = Validation.run(snap, Some(chunks), None, Some(articles))
    assert(r.orphanChunks == 1 && !r.passed)
  }

  test("orphan entities (NOT (n)--()) and article coverage") {
    val snap = Snapshot(
      entitiesDF(Seq((1L, "linked", "Concept", None), (2L, "lonely", "Tool", None),
        (3L, "target", "Standard", None))),
      Seq((1L, 3L, "RELATED_TO")).toDF("src", "dst", "relType"))
    val orphans = Validation.orphanEntities(snap).collect().map(_.getString(1))
    assert(orphans.toSeq == Seq("lonely"))

    val arts = Seq(("a1", "r1"), ("a2", "r1"), ("a3", "r2"))
      .toDF("article_id", "repo")
    val cov = Validation.articleCoverage(arts).head()
    assert(cov.getLong(0) == 3 && cov.getLong(1) == 2)
  }

  test("supplementary structure: chapters, resource fan-out, references") {
    val corpus = Seq(
      ("org-1/r0", "src/pkg0/File0.md", "c0", "md",
        "def[Concept:scope creep|uncontrolled growth]\nent[Tool:jira]"),
      ("org-1/r0", "src/pkg0/File1.scala", "c1", "scala", "plain line"),
      ("org-2/r1", "src/pkg1/File2.py", "c2", "py",
        "def[Concept:scope creep|growth]\ndef[Standard:iso 26262|safety]"),
      ("org-2/r1", "src/pkg1/File3.go", "c3", "go", "x"))
      .toDF("repo", "path", "commit", "lang", "content")
    val arts = Supplementary.articles(corpus)

    val ch = Supplementary.chapters(arts).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(ch == Map("org-1/r0" -> 2L, "org-2/r1" -> 2L))

    val inCh = Supplementary.inChapter(arts)
    assert(inCh.count() == 4)
    assert(inCh.select("chapter_number").distinct().count() == 2)

    val res = Supplementary.resources(arts)
    val kinds = res.select("kind", "rel_type").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kinds.subsetOf(Set(("Image", "HAS_IMAGE"), ("Video", "HAS_VIDEO"),
      ("Webinar", "HAS_WEBINAR"))))
    // the reference id scheme {article_id}-img{i}
    assert(res.filter(col("kind") === "Image")
      .select("resource_id").collect()
      .forall(_.getString(0).matches(".*-img\\d+")))

    // references resolve through the url→article mapping and drop self-refs
    val refs = Supplementary.articleReferences(arts, 4L).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val paths = Set("src/pkg0/File0.md", "src/pkg0/File1.scala",
      "src/pkg1/File2.py", "src/pkg1/File3.go")
    assert(refs.forall { case (s, t) => s != t && paths(s) && paths(t) })

    // glossary structure: term_id underscoring + RELEVANT_TO per repo
    val defs = Supplementary.definitionNodes(
      Seq(("Scope Creep", "d")).toDF("term", "definition")).head()
    assert(defs.getString(0) == "scope_creep")
    val rel = Supplementary.relevantTo(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rel.count(_._1 == "scope_creep") == 2) // defined in both repos
    assert(rel.count(_._1 == "iso_26262") == 1)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.ReadApi
import graft.chunking.Chunker
import graft.normalize.GlossaryLinker
import graft.normalize.Normalize.Snapshot
import graft.validate.Validation

class ChunkValidateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunker: texts ≤ 1500 stay whole; longer split 512/448 with min 100") {
    val short = "x" * 1000
    val long = "y" * 2000 // nWin = ceil(1936/448) = 5; last window = 2000-4*448=208 chars
    val docs = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val out = Chunker.chunk(docs, "doc_id", "text")
      .select("article_id", "chunk_index", "n_chars").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(out.count(_._1 == "1") == 1)
    assert(out.filter(_._1 == "1").head._3 == 1000)
    val longChunks = out.filter(_._1 == "2").sortBy(_._2)
    assert(longChunks.length == 5)
    assert(longChunks.take(4).forall(_._3 == 512))
    assert(longChunks.last._3 == 2000 - 4 * 448)
    // overlap: consecutive windows share 64 chars by construction (step 448)
  }

  test("chunker: trailing window under 100 chars is dropped; chunk ids zero-padded") {
    // len 1880 > threshold: nWin = ceil(1816/448) = 5; last window
    // = 1880 - 4*448 = 88 < 100 → dropped → 4 chunks
    val text = "z" * 1880
    val out = Chunker.chunk(Seq((7L, text)).toDF("doc_id", "text"), "doc_id", "text")
    val rows = out.orderBy("chunk_index").collect()
    assert(rows.length == 4)
    assert(rows.head.getAs[String]("chunk_id") == "7_chunk_0000")
    assert(rows.last.getAs[String]("chunk_id") == "7_chunk_0003")
  }

  test("mentioned-in backfill uses word boundaries ('rail' ≠ 'traceability')") {
    val chunks = Seq(
      ("a", "a_chunk_0000", 0, "the rail industry uses traceability tools", 42),
      ("b", "b_chunk_0000", 0, "traceability only here", 22))
      .toDF("article_id", "chunk_id", "chunk_index", "text", "n_chars")
    val entities = Seq(
      (1L, "rail", "Industry"), (2L, "iso 26262", "Standard"),
      (3L, "trace", "Industry"), // substring of traceability — must NOT match
      (4L, "abc", "Industry")) // shorter than 4 chars — excluded
      .toDF("id", "name", "label")
    val mi = Chunker.backfillMentionedIn(chunks, entities)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(mi == Set((1L, "a_chunk_0000")))
  }

  test("chunk repair drops degenerate chunks and reindexes densely (M-11 + W-1)") {
    val chunks = Seq(
      ("a", "a_chunk_0000", 0, "long enough " * 20, 240),
      ("a", "a_chunk_0001", 1, "tiny", 4),
      ("a", "a_chunk_0002", 2, "also long " * 20, 200),
      ("b", "b_chunk_0000", 0, "kept by mention", 15))
      .toDF("article_id", "chunk_id", "chunk_index", "text", "n_chars")
    val mi = Seq((9L, "b_chunk_0000")).toDF("entity_id", "chunk_id")
    val out = Chunker.repairChunks(chunks, mi)
      .select("article_id", "chunk_id", "chunk_index").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set(
      ("a", "a_chunk_0000", 0), ("a", "a_chunk_0001", 1), // 0002 renumbered → 0001
      ("b", "b_chunk_0000", 0)))
  }

  test("validation gate over clean and dirty snapshots") {
    def ent(rows: (Long, String, String)*) = rows.toSeq.toDF("id", "name", "label")
      .select(col("id"), col("name"), lit(null).cast("string").as("displayName"),
        col("label"), lit(null).cast("string").as("definition"),
        array().cast("array<string>").as("aliases"),
        array().cast("array<string>").as("sourceSpans"))
    val edges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "relType")

    val clean = Snapshot(ent((1L, "requirements traceability", "Concept")), edges)
    assert(Validation.run(clean).passed)

    val dirty = Snapshot(ent(
      (1L, "dup", "Concept"), (2L, "dup", "Concept"), // duplicate
      (3L, "requirement", "Concept"), (4L, "requirements", "Concept")), // plural pair
      edges)
    val r = Validation.run(dirty)
    assert(!r.passed)
    assert(r.duplicateEntities == 1 && r.pluralDuplicates == 1)
    assert(r.toMarkdown.contains("FAILED"))
  }

  test("invalid-pattern detection against the 50 PATTERNS (J-10)") {
    val ents = Seq((1L, "a", "Concept"), (2L, "b", "Challenge"), (3L, "c", "Standard"))
      .toDF("id", "name", "label")
      .select(col("id"), col("name"), lit(null).cast("string").as("displayName"),
        col("label"), lit(null).cast("string").as("definition"),
        array().cast("array<string>").as("aliases"),
        array().cast("array<string>").as("sourceSpans"))
    val edges = Seq(
      (1L, 2L, "ADDRESSES"), // Concept ADDRESSES Challenge: valid
      (2L, 3L, "PUBLISHES")) // Challenge PUBLISHES Standard: invalid
      .toDF("src", "dst", "relType")
    val bad = Validation.invalidPatterns(Snapshot(ents, edges)).collect()
    assert(bad.length == 1)
    assert(bad.head.getString(0) == "Challenge" && bad.head.getString(1) == "PUBLISHES")
  }

  test("glossary linking: exact beats fuzzy; fuzzy needs ≥ 85 (glossary_linker.py:43-102)") {
    val defs = Seq(
      ("traceability", "def1"), // exact
      ("tracability", "def2"), // fuzzy 95.7 vs traceability
      ("unrelated zebra", "def3")) // no match
      .toDF("term", "definition")
    val concepts = Seq((1L, "traceability", "Concept"), (2L, "validation", "Concept"))
      .toDF("id", "name", "label")
    val links = GlossaryLinker.linkDefinitions(defs, concepts)
      .collect().map(r => (r.getString(0), r.getString(2), r.getBoolean(4))).toSet
    assert(links == Set(
      ("traceability", "traceability", true),
      ("tracability", "traceability", false)))
  }

  test("definition backfill fills only empty definitions (J-5)") {
    val ents = Seq((1L, "traceability", "Concept", null),
      (2L, "validation", "Concept", "keep me"))
      .toDF("id", "name", "label", "definition")
    val defs = Seq(("Traceability", "from glossary"), ("validation", "would overwrite"))
      .toDF("term", "definition")
    val out = GlossaryLinker.backfillDefinitions(ents, defs)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "from glossary")
    assert(out(2L) == "keep me")
  }

  test("read API: search, neighborhood direction flags, communities") {
    val ents = Seq((1L, "requirements traceability", "Concept"),
      (2L, "scope creep", "Challenge"), (3L, "trace matrix", "Artifact"))
      .toDF("id", "name", "label")
      .select(col("id"), col("name"), lit(null).cast("string").as("displayName"),
        col("label"), lit(null).cast("string").as("definition"),
        array().cast("array<string>").as("aliases"),
        array().cast("array<string>").as("sourceSpans"))
    val edges = Seq((1L, 2L, "ADDRESSES"), (3L, 1L, "RELATED_TO"))
      .toDF("src", "dst", "relType")
    val s = Snapshot(ents, edges)

    val found = ReadApi.entitySearch(s, "trace").collect()
    assert(found.map(_.getString(0)).toSet ==
      Set("requirements traceability", "trace matrix"))

    val nb = ReadApi.neighborhood(s, "requirements traceability")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(nb == Set(("ADDRESSES", "->", "scope creep"),
      ("RELATED_TO", "<-", "trace matrix")))
  }

  test("PageRank resumes from a durable checkpoint mid-iteration (G-7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // irregular out-degrees (quadratic residues) — a permutation graph
    // would converge instantly at uniform rank
    val edges = (0 until 400).map { i =>
      ((i * 31 + 7) % 100L, (i * i * 13 + 7) % 100L)
    }.filter(e => e._1 != e._2).distinct.toDF("src", "dst")

    // phase 1: run only 2 supersteps, checkpoint every 2
    val c1 = new algo.Superstep(spark, dir, every = 2)
    val r1 = PageRankTestHook.run(spark, edges, 4, maxIter = 2, Some(c1))
    assert(!r1.converged && c1.latest().contains(2))

    // phase 2: resume from the checkpoint and converge
    val c2 = new algo.Superstep(spark, dir, every = 2)
    val r2 = PageRankTestHook.run(spark, edges, 4, maxIter = 100, Some(c2))
    assert(r2.converged)
    assert(r2.iterations > 2) // continued, not restarted

    // ground truth: fresh full run matches the resumed run to 1e-9
    val fresh = PageRankTestHook.run(spark, edges, 4, maxIter = 100, None)
    val a = r2.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = fresh.ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    b.foreach { case (k, v) => assert(math.abs(a(k) - v) < 1e-9) }

    // metrics JSON exists with per-partition lineage
    val m = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metrics/superstep=2.json")))
    assert(m.contains("partitionId") && m.contains("lineageHash") && m.contains("delta"))
  }
}

object PageRankTestHook {
  def run(spark: org.apache.spark.sql.SparkSession, edges: org.apache.spark.sql.DataFrame,
          parts: Int, maxIter: Int, ckpt: Option[algo.Superstep]) =
    algo.PageRank.run(spark, edges, parts, maxIter = maxIter, ckpt = ckpt)
}

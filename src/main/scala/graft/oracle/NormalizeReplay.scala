package graft.oracle

import org.apache.spark.sql.SparkSession

import graft.model
import graft.normalize.Vocab

/** DuckDB replay of the realistic extract → normalize pipeline
  * (VERDICT r4 "Next round" #1): generates the oracle SQL that
  * re-derives `g7_norm_entities` (and the other realistic-input
  * surfaces) from the raw corpus parquet, independently of the Spark
  * implementation.
  *
  * Mechanism: the corpus is synthesized with Spark expressions
  * (xxhash64), which DuckDB cannot recompute — so the Spark side dumps
  * the corpus TABLE (whose integrity is separately pinned by the
  * sha256 `corpus_manifest` driver row and GoldenManifestSpec) to a
  * fixed path during Verify, and the oracle replays the entire
  * downstream computation — marker regex extraction
  * (extract/Extractor.scala semantics, standing in for
  * extraction/pipeline.py:313-538) and the full normalize chain
  * backfill → M-1…M-7 (normalize/Normalize.scala, semantics from
  * scraper.py:721-884 / normalizer.py / entity_cleanup.py /
  * industry_taxonomy.py) — in pure DuckDB SQL over that parquet.
  *
  * Key-space argument: Spark entity ids are `xxhash64(rawName, label)`
  * and every merge/delete/remap in the chain is decided by
  * (name, label) values only — id VALUES are used solely as arbitrary
  * (but consistent) group representatives for edge routing. The replay
  * therefore tracks entities by the surrogate key
  * `rawName || chr(1) || rawLabel` and picks `min(key)` as each merge
  * group's representative: the final (name, label, aliases,
  * sourceSpans) rows and the final edge SET (as entity-row pairs) are
  * identical to Spark's up to the bijection between representatives,
  * which none of the checked outputs observe.
  *
  * Fuzzy M-6 branches: on this corpus every Industry-labeled name at
  * M-6 is an exact member of a vocab list (M-1 undoes all dirt forms;
  * plural dirt never applies to Industry pool entries) EXCEPT the
  * backfill-created industries (StandardIndustryMap values). Their
  * actions are precomputed at SQL-generation time with an independent
  * LCS implementation ([[lcsRatio]], full-matrix DP — deliberately not
  * the production two-row kernel in functions/IndelRatio.scala) and
  * embedded as literals; any other non-exact name falls through to
  * 'unknown' and a Spark/oracle divergence would fail the driver hash.
  */
object NormalizeReplay {

  // Under the repo's (gitignored) build dir, NOT /tmp: a /tmp dump was
  // observed disappearing minutes after a Verify run in this sandbox,
  // which would turn every replay oracle into an IO error at the
  // driver's compare step.
  val DumpPath = "/root/repo/target/graft_oracle_corpus"

  @volatile private var dumpedDir: String = null

  /** Write the corpus for `dir` to [[DumpPath]] once per JVM (re-dump
    * only if a different sf dir shows up). Every corpus-replay oracle
    * query calls this first, so the DuckDB side always reads the same
    * table the Spark side consumed.
    */
  def ensureDump(spark: SparkSession, dir: String): Unit = synchronized {
    if (dumpedDir != dir) {
      graft.SparkEntry.corpusFor(spark, dir)
        .write.mode("overwrite").parquet(DumpPath)
      dumpedDir = dir
    }
  }

  // ───────────────────── SQL-generation helpers ────────────────────────

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private def inList(terms: Iterable[String]): String =
    terms.toSeq.sorted.map(q).mkString("(", ", ", ")")

  /** Independent normalized-indel similarity (rapidfuzz fuzz.ratio
    * semantics, 200*LCS/(|a|+|b|)) used ONLY to precompute the
    * handful of fuzzy M-6 literals at oracle-generation time. Written
    * as the classic full-matrix LCS on purpose — NOT the production
    * kernel — so the oracle stays an independent computation.
    */
  private[graft] def lcsRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 100.0
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a.charAt(i - 1) == b.charAt(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    200.0 * dp(a.length)(b.length) / (a.length + b.length)
  }

  /** M-6 classification for a name that misses every exact list —
    * replays industry_taxonomy.py:246-320's fuzzy cascade at
    * generation time. Returns (action, canonicalOrNull).
    */
  private def fuzzyAction(name: String): (String, String) = {
    // rapidfuzz process.extractOne: best score, ties to the FIRST dict
    // key (insertion order) — max by (score, -ord)
    val taxBest = Vocab.IndustryTaxonomy.zipWithIndex
      .map { case ((v, c), i) => (lcsRatio(name, v), -i, c) }.max
    val conceptBest =
      Vocab.ConceptsNotIndustries.map(t => lcsRatio(name, t)).max
    val genericBest =
      Vocab.IndustryGenericToDelete.map(t => lcsRatio(name, t)).max
    if (taxBest._1 >= 80) ("keep_fuzzy", taxBest._3)
    else if (conceptBest >= 75) ("reclassify", null)
    else if (genericBest >= 75) ("delete", null)
    else ("unknown", null)
  }

  /** Literal VALUES rows (name, action, canonical) for every
    * backfill-creatable industry name that misses the exact lists.
    */
  private def nonExactRows: Seq[(String, String, String)] = {
    val exact = Vocab.IndustryTaxonomy.map(_._1).toSet ++
      Vocab.ConceptsNotIndustries ++ Vocab.OrganizationsNotIndustries ++
      Vocab.IndustryGenericToDelete
    Vocab.StandardIndustryMap.map(_._2).distinct
      .filterNot(exact)
      .map { n => val (a, c) = fuzzyAction(n); (n, a, c) }
  }

  private def rankCase: String =
    Vocab.LabelPriority.zipWithIndex
      .map { case (l, i) => s"WHEN ${q(l)} THEN ${i + 1}" }
      .mkString("CASE label ", " ", " ELSE 99 END")

  /** The shared CTE chain: corpus → markers → raw entities/edges →
    * M-1 → backfill → M-2 → M-3 → M-4 → M-5 → M-6(+merge) → M-7.
    * Ends with `e7` (final entities: k, name, label, aliases, spans)
    * and `edges7` (final edges: sk, dk, relType).
    */
  private lazy val chain: String = {
    val relRe = """^rel\[([^|]+)\|([^:]+):([^|]*)\|([^:]+):([^\]]*)\]$"""
    val entRe = """^ent\[([^:]+):([^|\]]*)(\|a:([^\]]*))?\]$"""
    val defRe = """^def\[([^:]+):([^|]*)\|(.*)\]$"""
    val markerRe = """(ent|rel|def)\[[^\]]*\]"""
    val cap = graft.extract.Extractor.MaxListProp

    val stdMapVals = Vocab.StandardIndustryMap
      .map { case (s, i) => s"(${q(s)}, ${q(i)})" }.mkString(", ")
    val taxVals = Vocab.IndustryTaxonomy
      .map { case (v, c) => s"(${q(v)}, ${q(c)})" }.mkString(", ")
    val nxVals = nonExactRows
      .map { case (n, a, c) =>
        s"(${q(n)}, ${q(a)}, ${if (c == null) "NULL" else q(c)})" }
      .mkString(", ")

    s"""
WITH corpus AS (
  SELECT * FROM read_parquet('$DumpPath/*.parquet')
),
markers AS (
  SELECT path, unnest(regexp_extract_all(content, '$markerRe')) AS m
  FROM corpus
),
mention0 AS (
  SELECT path,
         regexp_extract(m, '$entRe', 2) AS name,
         regexp_extract(m, '$entRe', 1) AS label,
         nullif(regexp_extract(m, '$entRe', 4), '') AS alias,
         false AS hasdef
  FROM markers WHERE m LIKE 'ent[%'
  UNION ALL
  SELECT path,
         regexp_extract(m, '$defRe', 2),
         regexp_extract(m, '$defRe', 1),
         NULL, true
  FROM markers WHERE m LIKE 'def[%'
  UNION ALL
  SELECT path, regexp_extract(m, '$relRe', 3), regexp_extract(m, '$relRe', 2),
         NULL, false
  FROM markers WHERE m LIKE 'rel[%'
  UNION ALL
  SELECT path, regexp_extract(m, '$relRe', 5), regexp_extract(m, '$relRe', 4),
         NULL, false
  FROM markers WHERE m LIKE 'rel[%'
),
e0 AS (  -- raw-surface grain, Extractor.entities semantics
  SELECT name, label,
         COALESCE(list_sort(list_distinct(list(alias) FILTER (WHERE alias IS NOT NULL))),
                  CAST([] AS VARCHAR[]))[1:$cap] AS aliases,
         COALESCE(list_sort(list_distinct(list(path))), CAST([] AS VARCHAR[]))[1:$cap] AS spans,
         bool_or(hasdef) AS hasdef
  FROM mention0 WHERE name <> ''
  GROUP BY name, label
),
edges0 AS (
  SELECT DISTINCT
    regexp_extract(m, '$relRe', 3) || chr(1) || regexp_extract(m, '$relRe', 2) AS sk,
    regexp_extract(m, '$relRe', 5) || chr(1) || regexp_extract(m, '$relRe', 4) AS dk,
    regexp_extract(m, '$relRe', 1) AS relType
  FROM markers
  WHERE m LIKE 'rel[%'
    AND regexp_extract(m, '$relRe', 3) <> ''
    AND regexp_extract(m, '$relRe', 5) <> ''
),
e1 AS (  -- M-1 name normalization (normalizer.py:20-53)
  SELECT name || chr(1) || label AS k,
         regexp_replace(regexp_replace(lower(trim(name)), '\\s+', ' ', 'g'),
                        '^[^a-zA-Z0-9_]+|[^a-zA-Z0-9_]+$$', '', 'g') AS name,
         label, aliases, spans, hasdef
  FROM e0
),
stdmap(std_name, ind_name) AS (VALUES $stdMapVals),
std_present AS (
  SELECT e.k, m.ind_name FROM e1 e JOIN stdmap m ON e.name = m.std_name
  WHERE e.label = 'Standard'
),
ind1 AS (SELECT k, name FROM e1 WHERE label = 'Industry'),
new_inds AS (  -- backfill-created Industry nodes (mentioned_in_backfill.py:106-135)
  SELECT DISTINCT ind_name AS name FROM std_present
  WHERE ind_name NOT IN (SELECT name FROM ind1)
),
e1b AS (
  SELECT k, name, label, aliases, spans, hasdef FROM e1
  UNION ALL
  SELECT name || chr(1) || 'Industry' || chr(2) AS k, name, 'Industry',
         CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[]), false
  FROM new_inds
),
edges1 AS (
  SELECT DISTINCT sk, dk, relType FROM (
    SELECT sk, dk, relType FROM edges0
    UNION ALL
    SELECT s.k AS sk,
           COALESCE(i.k, s.ind_name || chr(1) || 'Industry' || chr(2)) AS dk,
           'APPLIES_TO' AS relType
    FROM std_present s LEFT JOIN ind1 i ON i.name = s.ind_name
  )
),
g2 AS (  -- M-2 same-label dedup (normalizer.py:207-323)
  SELECT label, name, min(k) AS ck,
         COALESCE(list_sort(list_distinct(flatten(list(aliases)))), CAST([] AS VARCHAR[]))[1:$cap] AS aliases,
         COALESCE(list_sort(list_distinct(flatten(list(spans)))), CAST([] AS VARCHAR[]))[1:$cap] AS spans,
         bool_or(hasdef) AS hasdef
  FROM e1b GROUP BY label, name
),
map2 AS (SELECT e.k, g.ck FROM e1b e JOIN g2 g ON e.label = g.label AND e.name = g.name),
e2 AS (SELECT ck AS k, name, label, aliases, spans, hasdef FROM g2),
edges2 AS (
  SELECT DISTINCT m1.ck AS sk, m2.ck AS dk, relType
  FROM edges1 e JOIN map2 m1 ON e.sk = m1.k JOIN map2 m2 ON e.dk = m2.k
),
e2r AS (SELECT *, $rankCase AS rank FROM e2),
g3 AS (  -- M-3 cross-label dedup by LABEL_PRIORITY (normalizer.py:354-577)
  -- (rank, k) tuple order via a fixed-width string key: DuckDB's
  -- arg_min rejects STRUCT ordering args
  SELECT name,
         arg_min(k, lpad(rank::VARCHAR, 2, '0') || k) AS ck,
         arg_min(label, lpad(rank::VARCHAR, 2, '0') || k) AS label,
         COALESCE(list_sort(list_distinct(flatten(list(aliases)))), CAST([] AS VARCHAR[]))[1:$cap] AS aliases,
         COALESCE(list_sort(list_distinct(flatten(list(spans)))), CAST([] AS VARCHAR[]))[1:$cap] AS spans,
         bool_or(hasdef) AS hasdef
  FROM e2r GROUP BY name
),
map3 AS (SELECT e.k, g.ck FROM e2r e JOIN g3 g ON e.name = g.name),
e3 AS (SELECT ck AS k, name, label, aliases, spans, hasdef FROM g3),
edges3 AS (
  SELECT DISTINCT m1.ck AS sk, m2.ck AS dk, relType
  FROM edges2 e JOIN map3 m1 ON e.sk = m1.k JOIN map3 m2 ON e.dk = m2.k
),
e4 AS (  -- M-4 generic delete (entity_cleanup.py:43-144)
  SELECT * FROM e3 WHERE lower(name) NOT IN ${inList(Vocab.GenericTermsToDelete)}
),
edges4 AS (
  SELECT e.* FROM edges3 e
  JOIN e4 a ON e.sk = a.k JOIN e4 b ON e.dk = b.k
),
pairs5 AS (  -- M-5 dynamic plural→singular (entity_cleanup.py:556-670)
  SELECT p.k AS k, s.k AS ck
  FROM e4 p JOIN e4 s
    ON p.label = s.label AND p.name = s.name || 's'
  WHERE s.name IS NOT NULL AND NOT s.name LIKE '%s'
),
e5 AS (SELECT * FROM e4 WHERE k NOT IN (SELECT k FROM pairs5)),
edges5 AS (
  SELECT DISTINCT COALESCE(m1.ck, e.sk) AS sk, COALESCE(m2.ck, e.dk) AS dk, relType
  FROM edges4 e
  LEFT JOIN pairs5 m1 ON e.sk = m1.k
  LEFT JOIN pairs5 m2 ON e.dk = m2.k
),
tax(variant, canonical) AS (VALUES $taxVals),
nx(name, action, canonical) AS (VALUES $nxVals),
cls AS (  -- M-6 classify_industry_term (industry_taxonomy.py:246-320)
  SELECT e.*,
    CASE
      WHEN lower(e.name) IN ${inList(Vocab.OrganizationsNotIndustries)} THEN 'reclassify_org'
      WHEN lower(e.name) IN ${inList(Vocab.ConceptsNotIndustries)} THEN 'reclassify'
      WHEN lower(e.name) IN ${inList(Vocab.IndustryGenericToDelete)} THEN 'delete'
      WHEN t.canonical IS NOT NULL THEN 'keep_exact'
      ELSE COALESCE(n.action, 'unknown')
    END AS action,
    COALESCE(t.canonical, n.canonical) AS new_name
  FROM e5 e
  LEFT JOIN tax t ON lower(e.name) = t.variant
  LEFT JOIN nx n ON e.name = n.name
  WHERE e.label = 'Industry'
),
e6a AS (
  SELECT k, name, label, aliases, spans, hasdef FROM e5 WHERE label <> 'Industry'
  UNION ALL
  SELECT k,
         CASE WHEN action IN ('keep_exact', 'keep_fuzzy') THEN new_name ELSE name END AS name,
         CASE action WHEN 'reclassify' THEN 'Concept'
                     WHEN 'reclassify_org' THEN 'Organization'
                     ELSE label END AS label,
         aliases, spans, hasdef
  FROM cls WHERE action <> 'delete'
),
edges6a AS (
  SELECT e.* FROM edges5 e
  JOIN e6a a ON e.sk = a.k JOIN e6a b ON e.dk = b.k
),
g6 AS (  -- M-6 merge-if-exists (industry_taxonomy.py:558-654)
  SELECT label, name, min(k) AS ck,
         COALESCE(list_sort(list_distinct(flatten(list(aliases)))), CAST([] AS VARCHAR[]))[1:$cap] AS aliases,
         COALESCE(list_sort(list_distinct(flatten(list(spans)))), CAST([] AS VARCHAR[]))[1:$cap] AS spans,
         bool_or(hasdef) AS hasdef
  FROM e6a GROUP BY label, name
),
map6 AS (SELECT e.k, g.ck FROM e6a e JOIN g6 g ON e.label = g.label AND e.name = g.name),
e6 AS (SELECT ck AS k, name, label, aliases, spans, hasdef FROM g6),
edges6 AS (
  SELECT DISTINCT m1.ck AS sk, m2.ck AS dk, relType
  FROM edges6a e JOIN map6 m1 ON e.sk = m1.k JOIN map6 m2 ON e.dk = m2.k
),
e7 AS (  -- M-7 mislabeled-Challenge relabel (validation/fixes.py:233-315)
  SELECT k, name,
         CASE WHEN label = 'Challenge'
                   AND split_part(lower(trim(name)), ' ', 1) IN ${inList(Vocab.PositiveOutcomeWords)}
                   AND name NOT IN (SELECT DISTINCT name FROM e6 WHERE label = 'Concept')
              THEN 'Concept' ELSE label END AS label,
         aliases, spans, hasdef
  FROM e6
),
edges7 AS (SELECT * FROM edges6)
"""
  }

  // ─────────────────────────── oracle SQLs ─────────────────────────────

  /** g7_norm_entities: the final normalized entity table. */
  lazy val g7Sql: String =
    chain + s"""
SELECT name, label, CAST(len(spans) AS BIGINT) AS n_spans,
       COALESCE(array_to_string(aliases, ','), '') AS aliases
FROM e7"""

  /** g1_semantic_edges: distinct name pairs of the semantic graph
    * (GraphOps.semanticGraph projection, community_detection.py:120-154).
    */
  lazy val g1Sql: String =
    chain + s"""
SELECT DISTINCT es.name AS src_name, ed.name AS dst_name
FROM (SELECT * FROM edges7 WHERE relType IN ${inList(model.SemanticRelTypes)}) e
JOIN e7 es ON e.sk = es.k
JOIN e7 ed ON e.dk = ed.k
WHERE es.name <> ed.name"""

  /** api_entity_search("trace", k=10): CONTAINS filter + incident-edge
    * counts (query_knowledge_graph.py:154-169).
    */
  lazy val apiEntitySearchSql: String =
    chain + s"""
, deg AS (
  SELECT id, CAST(count(*) AS BIGINT) AS connections FROM (
    SELECT sk AS id FROM edges7 UNION ALL SELECT dk AS id FROM edges7
  ) GROUP BY id
)
SELECT e.name, e.label, COALESCE(d.connections, 0) AS connections
FROM e7 e LEFT JOIN deg d ON e.k = d.id
WHERE lower(e.name) LIKE '%trace%'
ORDER BY connections DESC, e.name
LIMIT 10"""

  /** api_neighborhood("requirements traceability"): 1-hop with
    * direction flags (query_knowledge_graph.py:184-199).
    */
  lazy val apiNeighborhoodSql: String =
    chain + s"""
, target AS (SELECT k FROM e7 WHERE name = 'requirements traceability')
SELECT DISTINCT * FROM (
  SELECT e.relType, '->' AS direction, n.name AS neighbor
  FROM edges7 e JOIN target t ON e.sk = t.k JOIN e7 n ON e.dk = n.k
  UNION ALL
  SELECT e.relType, '<-' AS direction, n.name AS neighbor
  FROM edges7 e JOIN target t ON e.dk = t.k JOIN e7 n ON e.sk = n.k
)"""

  /** api_top_mentioned: Chunker windows (512/64/1500/100,
    * chunking/config.py:40-45) + MENTIONED_IN word-boundary backfill
    * (mentioned_in_backfill.py:72-104) + top-20 by mention count
    * (query_knowledge_graph.py:126-135), all replayed from the corpus.
    */
  lazy val apiTopMentionedSql: String =
    chain + s"""
, chk AS (
  SELECT path AS article_id, i AS chunk_index,
         CASE WHEN length(content) <= 1500 THEN content
              ELSE substr(content, i*448 + 1, 512) END AS text
  FROM corpus, unnest(generate_series(0,
        CASE WHEN length(content) <= 1500 THEN 0
             ELSE CAST(ceil((length(content) - 64) / 448.0) AS INT) - 1 END)) t(i)
),
chk2 AS (SELECT * FROM chk WHERE chunk_index = 0 OR length(text) >= 100),
terms AS (
  SELECT k, name FROM e7
  WHERE label IN ('Standard', 'Industry') AND name IS NOT NULL
    AND length(name) >= 4
),
mi AS (
  SELECT DISTINCT t.k, c.article_id, c.chunk_index
  FROM chk2 c JOIN terms t
    ON contains(' ' || lower(c.text) || ' ', ' ' || lower(t.name) || ' ')
),
cnt AS (SELECT k, CAST(count(*) AS BIGINT) AS mentions FROM mi GROUP BY k)
SELECT e.name, e.label, c.mentions
FROM cnt c JOIN e7 e ON e.k = c.k
ORDER BY c.mentions DESC, e.name
LIMIT 20"""

  /** j4_mentioned_in_backfill: per-entity MENTIONED_IN chunk counts —
    * the same chunk + padded-contains replay as api_top_mentioned,
    * ungated by the top-20 cut.
    */
  lazy val j4MentionedInSql: String =
    chain + s"""
, chk AS (
  SELECT path AS article_id, i AS chunk_index,
         CASE WHEN length(content) <= 1500 THEN content
              ELSE substr(content, i*448 + 1, 512) END AS text
  FROM corpus, unnest(generate_series(0,
        CASE WHEN length(content) <= 1500 THEN 0
             ELSE CAST(ceil((length(content) - 64) / 448.0) AS INT) - 1 END)) t(i)
),
chk2 AS (SELECT * FROM chk WHERE chunk_index = 0 OR length(text) >= 100),
terms AS (
  SELECT k, name FROM e7
  WHERE label IN ('Standard', 'Industry') AND name IS NOT NULL
    AND length(name) >= 4
),
mi AS (
  SELECT DISTINCT t.k, c.article_id, c.chunk_index
  FROM chk2 c JOIN terms t
    ON contains(' ' || lower(c.text) || ' ', ' ' || lower(t.name) || ' ')
)
SELECT e.name, e.label, CAST(count(*) AS BIGINT) AS n_chunks
FROM mi JOIN e7 e ON e.k = mi.k
GROUP BY e.name, e.label"""

  /** val_invalid_patterns: (srcLabel, relType, dstLabel) triples not in
    * the ~50-row schema whitelist (validation/queries.py:164-204).
    */
  lazy val valInvalidPatternsSql: String = {
    val patVals = model.ValidPatterns
      .map { case (a, r, b) => s"(${q(a)}, ${q(r)}, ${q(b)})" }.mkString(", ")
    chain + s"""
, pat(srcLabel, relType, dstLabel) AS (VALUES $patVals),
lbl AS (
  SELECT e.relType, es.label AS srcLabel, ed.label AS dstLabel
  FROM edges7 e JOIN e7 es ON e.sk = es.k JOIN e7 ed ON e.dk = ed.k
)
SELECT l.srcLabel, l.relType, l.dstLabel,
       CAST(count(*) AS BIGINT) AS violations
FROM lbl l
WHERE NOT EXISTS (SELECT 1 FROM pat p
  WHERE p.srcLabel = l.srcLabel AND p.relType = l.relType
    AND p.dstLabel = l.dstLabel)
GROUP BY l.srcLabel, l.relType, l.dstLabel"""
  }

  /** g6_triangle_count: exact triangle count of the semantic graph via
    * the ordered 3-way join over name-level undirected pairs.
    */
  lazy val g6TriangleSql: String =
    chain + s"""
, sem AS (
  SELECT DISTINCT es.name AS a, ed.name AS b
  FROM (SELECT * FROM edges7 WHERE relType IN ${inList(model.SemanticRelTypes)}) e
  JOIN e7 es ON e.sk = es.k
  JOIN e7 ed ON e.dk = ed.k
  WHERE es.name <> ed.name
),
up AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM sem)
SELECT CAST(count(*) AS BIGINT) AS triangles
FROM up e1
JOIN up e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN up e3 ON e3.u = e1.v AND e3.v = e2.v"""

  /** corpus_manifest: per-row content sha256 — DuckDB hashes the
    * dumped parquet itself, so a stale or corrupted dump can no longer
    * silently satisfy the other replay oracles (the north-rule per-row
    * content invariant now gates the shared input too).
    */
  lazy val corpusManifestSql: String = s"""
WITH corpus AS (SELECT * FROM read_parquet('$DumpPath/*.parquet'))
SELECT repo, path, sha256(content) AS content_sha256 FROM corpus"""

  /** val_article_coverage: article totals over the corpus
    * (validation/queries.py:206-229 shape).
    */
  lazy val valArticleCoverageSql: String = s"""
WITH corpus AS (SELECT * FROM read_parquet('$DumpPath/*.parquet'))
SELECT CAST(count(*) AS BIGINT) AS total_articles,
       CAST(count(DISTINCT repo) AS BIGINT) AS chapters_with_articles
FROM corpus"""

  /** j5_definition_backfill: per-label counts of entities with a
    * non-null definition after glossary backfill (fixes.py:412-423).
    * Definition CONTENT merges are id-order-dependent (first non-null
    * in hash order) but definition NULLNESS is not: non-null after the
    * chain ⟺ some raw (name,label) member carried a def marker
    * (tracked as `hasdef` through every merge) ∨ a glossary term
    * matches lower(name). The corpus emits no empty definitions, so
    * nullness is exactly the backfilled-definition predicate.
    */
  lazy val j5Sql: String = {
    val defRe = """^def\[([^:]+):([^|]*)\|(.*)\]$"""
    chain + s"""
, gloss AS (
  SELECT DISTINCT lower(regexp_extract(m, '$defRe', 2)) AS t
  FROM markers WHERE m LIKE 'def[%'
    AND regexp_extract(m, '$defRe', 2) <> ''
)
SELECT label, CAST(count(*) AS BIGINT) AS n_defined
FROM e7
WHERE hasdef OR lower(name) IN (SELECT t FROM gloss)
GROUP BY label"""
  }

  /** glossary_links: exact-then-fuzzy(≥85) definition→concept links
    * (glossary_linker.py:43-102). Terms are the RAW lowered def-marker
    * surfaces (unpadded only by lower()); fuzzy = normalized indel =
    * 200·LCS/(|a|+|b|), computed here by the recursive-CTE LCS (DP row
    * as a LIST; the cur[i−1] carry realized as a window prefix-max —
    * same construction as the j6 oracle). Argmax ties break to
    * min(concept_name) where Spark breaks to min concept id — the
    * sf-corpus data is tie-free (a tie would fail the driver hash
    * loudly, not silently).
    */
  lazy val glossaryLinksSql: String = {
    val defRe = """^def\[([^:]+):([^|]*)\|(.*)\]$"""
    chain.replaceFirst("\\s*WITH ", "WITH RECURSIVE ") + s"""
, terms AS (
  SELECT DISTINCT lower(regexp_extract(m, '$defRe', 2)) AS term
  FROM markers WHERE m LIKE 'def[%'
    AND regexp_extract(m, '$defRe', 2) <> ''
),
concepts AS (SELECT name FROM e7 WHERE label = 'Concept'),
gpairs AS (
  SELECT row_number() OVER (ORDER BY t.term, c.name) AS pid,
         t.term AS a, c.name AS b
  FROM terms t CROSS JOIN concepts c
),
grec(pid, j, dp) AS (
  SELECT pid, 0, list_transform(range(0, length(a)+1), x -> 0) FROM gpairs
  UNION ALL
  SELECT pid, j+1, newdp FROM (
    SELECT r.pid, r.j,
      (SELECT list(mx ORDER BY i) FROM (
         SELECT i, max(t) OVER (ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
         FROM (
           SELECT i,
             CASE WHEN substr(p.a, CAST(i AS INT), 1)
                       = substr(p.b, r.j + 1, 1)
                  THEN r.dp[CAST(i AS INT)] + 1
                  ELSE r.dp[CAST(i AS INT) + 1] END AS t
           FROM unnest(range(1, length(p.a)+1)) u(i)))) AS tail
    FROM grec r JOIN gpairs p USING (pid)
    WHERE r.j < length(p.b)
  ) s CROSS JOIN LATERAL (SELECT list_prepend(0, s.tail) AS newdp) l),
scored AS (
  SELECT p.a AS term, p.b AS concept_name,
         CASE WHEN p.a = p.b THEN 200.0
              ELSE 200.0 * r.dp[length(p.a)+1] / (length(p.a)+length(p.b))
         END AS rawscore
  FROM grec r JOIN gpairs p USING (pid) WHERE r.j = length(p.b)
),
best AS (
  SELECT term, max(rawscore) AS mx FROM scored GROUP BY term
)
SELECT s.term,
       min(s.concept_name) AS concept_name,
       round(least(b.mx, 100.0), 4) AS score,
       b.mx >= 200.0 AS exact
FROM scored s JOIN best b ON s.term = b.term AND s.rawscore = b.mx
WHERE b.mx >= 85.0
GROUP BY s.term, b.mx"""
  }

  // ── iterative algorithms over the replayed semantic graph ──────────
  //
  // DuckDB 1.0's recursive CTEs mis-evaluate correlated aggregate
  // subqueries over outer CTEs (observed: a bare UNION deduplicating
  // CTE loses its dedup and per-iteration updates lag one step), so
  // the iterative twins below are STATICALLY UNROLLED instead, with
  // freeze-after-convergence semantics: once max|r_k − r_{k−1}| < tol
  // every later step copies r_k verbatim, so any unroll depth ≥ the
  // actual stopping iteration reproduces Spark's exact final iterate —
  // not the deeper fixpoint. CTEs are AS MATERIALIZED throughout
  // (un-materialized, each reference re-evaluates the whole chain).

  /** Shared name-keyed semantic-graph CTEs (dense integer vids):
    * `vmap`, `ge` (+w), `odg`, `c`, `r0`, `d0`.
    */
  private def semGraphCtes(weighted: Boolean): String = {
    val rels = inList(model.SemanticRelTypes)
    val base =
      if (weighted) s"""
, wsem AS MATERIALIZED (
  SELECT es.name AS a, ed.name AS b,
         CAST(count(DISTINCT e.relType) AS DOUBLE) AS w
  FROM (SELECT * FROM edges7 WHERE relType IN $rels) e
  JOIN e7 es ON e.sk = es.k JOIN e7 ed ON e.dk = ed.k
  WHERE es.name <> ed.name
  GROUP BY es.name, ed.name
),
symg AS MATERIALIZED (
  SELECT a, b, max(w) AS w FROM
    (SELECT a, b, w FROM wsem UNION ALL SELECT b, a, w FROM wsem)
  GROUP BY a, b)"""
      else s"""
, semp AS MATERIALIZED (
  SELECT DISTINCT es.name AS a, ed.name AS b
  FROM (SELECT * FROM edges7 WHERE relType IN $rels) e
  JOIN e7 es ON e.sk = es.k JOIN e7 ed ON e.dk = ed.k
  WHERE es.name <> ed.name
),
symg AS MATERIALIZED (SELECT DISTINCT a, b, 1.0 AS w FROM
  (SELECT a, b FROM semp UNION ALL SELECT b, a FROM semp))"""
    base + s"""
, vmap AS MATERIALIZED (
  SELECT name, CAST(row_number() OVER (ORDER BY name) AS INT) AS vid
  FROM (SELECT DISTINCT a AS name FROM symg)),
ge AS MATERIALIZED (
  SELECT s.vid AS svid, d.vid AS dvid, e.w
  FROM symg e JOIN vmap s ON e.a = s.name JOIN vmap d ON e.b = d.name),
odg AS MATERIALIZED (SELECT svid, sum(w) AS outdeg FROM ge GROUP BY svid),
c AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM vmap),
r0 AS MATERIALIZED (SELECT vid, 1.0 / (SELECT n FROM c) AS rank FROM vmap),
d0 AS (SELECT 1.0 AS delta)"""
  }

  /** g4_pagerank / g4_pagerank_weighted: dangling-free PageRank to
    * 1e-6 max-delta convergence, `steps` frozen-unrolled iterations
    * (PageRank.scala semantics: damping 0.85, uniform 1/n init,
    * contrib = rank/outDeg·w).
    */
  private def pagerankSql(weighted: Boolean, steps: Int): String = {
    val body = (1 to steps).map { k => s""",
r$k AS MATERIALIZED (
  SELECT v.vid,
    CASE WHEN (SELECT delta FROM d${k - 1}) < 1e-6 THEN r.rank
         ELSE (1.0 - 0.85) / (SELECT n FROM c) + 0.85 * coalesce(cb.contrib, 0.0)
    END AS rank
  FROM vmap v JOIN r${k - 1} r ON r.vid = v.vid
  LEFT JOIN (SELECT g.dvid AS vid, sum(r2.rank / o.outdeg * g.w) AS contrib
             FROM ge g JOIN r${k - 1} r2 ON r2.vid = g.svid
             JOIN odg o ON o.svid = g.svid GROUP BY g.dvid) cb ON cb.vid = v.vid),
d$k AS MATERIALIZED (SELECT max(abs(a.rank - b.rank)) AS delta
        FROM r$k a JOIN r${k - 1} b ON a.vid = b.vid)"""
    }.mkString
    chain + semGraphCtes(weighted) + body + s"""
SELECT v.name, round(r.rank, 6) AS rank
FROM r$steps r JOIN vmap v ON v.vid = r.vid"""
  }

  lazy val g4Sql: String = pagerankSql(weighted = false, steps = 60)
  lazy val g4WeightedSql: String = pagerankSql(weighted = true, steps = 60)

  /** g5_connected_components with min-NAME canonical labels:
    * `rounds` unrolled min-propagation steps (idempotent at the
    * fixpoint, so extra rounds are harmless; `rounds` must cover the
    * graph diameter — 30 ≫ the co-mention graph's ≤ ~10).
    */
  lazy val g5Sql: String = {
    val rounds = (1 to 30).map { k => s""",
m$k AS MATERIALIZED (
  SELECT v.name, least(v.comp, coalesce(nb.m, v.comp)) AS comp
  FROM m${k - 1} v LEFT JOIN (
    SELECT e.b AS name, min(v2.comp) AS m
    FROM symg e JOIN m${k - 1} v2 ON v2.name = e.a GROUP BY e.b) nb
  ON nb.name = v.name)"""
    }.mkString
    chain + semGraphCtes(weighted = false) + s""",
m0 AS MATERIALIZED (SELECT DISTINCT a AS name, a AS comp FROM symg)$rounds
SELECT name, comp AS component FROM m30"""
  }

  /** val_entity_stats: per-label totals + already-normalized counts
    * (validation/queries.py entity stats).
    */
  lazy val valEntityStatsSql: String =
    chain + s"""
SELECT label, CAST(count(*) AS BIGINT) AS total,
       CAST(sum(CASE WHEN name = lower(trim(name)) THEN 1 ELSE 0 END) AS BIGINT) AS normalized
FROM e7 GROUP BY label"""

  /** val_orphan_entities: count of entities with no incident edge. */
  lazy val valOrphanSql: String =
    chain + s"""
SELECT CAST(count(*) AS BIGINT) AS orphan_entities
FROM e7
WHERE k NOT IN (SELECT sk FROM edges7 UNION SELECT dk FROM edges7)"""
}

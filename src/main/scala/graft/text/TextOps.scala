package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline,
  * over a `documents(doc_id, text, lang, source, n_chars)` table.
  * All pure codegen'd column expressions — no UDFs — and each has an
  * ANSI-SQL-expressible twin for the DuckDB oracle.
  */
object TextOps {

  /** Small per-language stopword sets for the n-gram/stopword
    * language-ID heuristic.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "para", "con"))

  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter-runs, digit-runs and single
    * punctuation marks — the shape a byte-pair tokenizer's
    * pre-tokenization produces. RE2-compatible pattern (no lookarounds)
    * so the DuckDB oracle evaluates the identical regex.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Language ID: distinct-stopword hits per language, argmax with a
    * deterministic tie-break on language code; "und" when nothing hits.
    */
  def languageId(text: Column): Column = {
    val tk = tokens(text)
    val scored = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(tk, typedLit(words))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: mean of three bounded signals —
    * length (saturating at 400 chars), stopword ratio (×5 capped), and
    * alpha-character ratio. Deterministic arithmetic, rounded to 6dp.
    */
  def qualityScore(text: Column): Column = {
    val tk = tokens(text)
    val nTok = size(tk).cast("double")
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val stopHits = size(array_intersect(tk, typedLit(Stopwords("en")))).cast("double")
    val stopScore = least(when(nTok > 0, stopHits * 5.0 / nTok).otherwise(0.0), lit(1.0))
    val alphaRatio = when(length(text) > 0,
      length(regexp_replace(text, "[^a-zA-Z ]", "")).cast("double") / length(text))
      .otherwise(0.0)
    round((lenScore + stopScore + alphaRatio) / 3.0, 6)
  }

  /** Position-weighted rolling fingerprint:
    * Σ_i (i+1) * (ascii(token_i) * 31 + length(token_i)), exact integer
    * math, order-dependent, identical in Spark and DuckDB
    * (unnest WITH ORDINALITY there).
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .groupBy(idCol)
      .agg(sum((col("pos") + 1) *
        (ascii(col("tok")).cast("long") * 31L + length(col("tok")).cast("long")))
        .as("fingerprint"))

  /** URL canonicalization — the source-level dedup key a crawl
    * pipeline computes before any content hash: lowercase
    * scheme+host, strip default ports (https:443 / http:80), drop the
    * fragment, remove tracking parameters (utm_*, gclid, fbclid),
    * SORT the surviving query parameters, drop a trailing slash.
    * Pure codegen'd string/array expressions (RE2-class regexes, no
    * lookarounds), one stateless pass, engine-replayable.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // lowercase only scheme://host[:port]
    val head = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val headNoPort = regexp_replace(
      regexp_replace(head, "^(https://[^/?#:]*):443$", "$1"),
      "^(http://[^/?#:]*):80$", "$1")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/$", "")
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid)="))), "&")
    concat(headNoPort, path,
      when(kept =!= "", concat(lit("?"), kept)).otherwise(lit("")))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic document-quality filters of the kind large training-data
  * pipelines apply before dedup (repetition filters a la Gopher/C4
  * rules, PII redaction) — pure codegen'd expressions / keyed
  * aggregations, each with an exact DuckDB twin.
  *
  * Scale notes: `repetitionMetrics` shuffles (doc_id, line/gram) keyed
  * rows once per signal — keys carry the doc id so the agg is
  * embarrassingly parallel and map-side combinable; `redactPii` is a
  * stateless one-pass scan (RE2-class regexes, no backtracking blowup).
  */
object QualityFilters {

  /** Word bigrams as space-joined strings (NOT distinct — repetition
    * counting needs multiplicity).
    */
  private def bigrams(text: Column): Column = {
    val tk = TextOps.tokens(text)
    when(size(tk) >= 2,
      transform(sequence(lit(0), size(tk) - 2),
        i => concat_ws(" ", slice(tk, i + lit(1), lit(2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition metrics + a keep/flag verdict:
    *  - dup_line_frac: fraction of lines occurring more than once
    *    (repeated boilerplate / navigation);
    *  - top_bigram_frac: occurrences of the most frequent word bigram
    *    over all bigram slots (stuck-key / template spam);
    *  - symbol_word_ratio: marker symbols per word (Gopher uses #/…).
    * Thresholds follow the published Gopher rules (0.30 / 0.18 / 0.10).
    * Returns (doc_id, dup_line_frac, top_bigram_frac,
    * symbol_word_ratio, flagged).
    */
  def repetitionMetrics(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol),
      explode(filter(split(col(textCol), "\\n"), l => l =!= "")).as("line"))
    val lineFrac = lines.groupBy(idCol, "line").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg((sum(when(col("c") > 1, col("c")).otherwise(lit(0L))) /
        sum(col("c"))).as("dup_line_frac"))

    val grams = docs.select(col(idCol),
      explode(bigrams(col(textCol))).as("gram"))
    val gramFrac = grams.groupBy(idCol, "gram").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg((max(col("c")) / sum(col("c"))).as("top_bigram_frac"))

    val symbols = docs.select(col(idCol),
      (size(regexp_extract_all(col(textCol), lit("[#@*%^]|\\.\\.\\."), lit(0)))
        .cast("double") /
        greatest(TextOps.tokenCount(col(textCol)).cast("double"), lit(1.0)))
        .as("symbol_word_ratio"))

    docs.select(col(idCol))
      .join(lineFrac, Seq(idCol), "left")
      .join(gramFrac, Seq(idCol), "left")
      .join(symbols, Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("dup_line_frac"), lit(0.0)), 6).as("dup_line_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6).as("top_bigram_frac"),
        round(col("symbol_word_ratio"), 6).as("symbol_word_ratio"),
        (coalesce(col("dup_line_frac"), lit(0.0)) > 0.30 ||
          coalesce(col("top_bigram_frac"), lit(0.0)) > 0.18 ||
          col("symbol_word_ratio") > 0.10).cast("int").as("flagged"))
  }

  /** RE2-class patterns (no lookaround) so Spark and DuckDB evaluate
    * the identical automaton.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val PhoneRe = "\\+?[0-9][0-9]{2}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII redaction: masks emails/phones with typed placeholders and
    * reports per-doc match counts. One stateless pass over the corpus.
    * Returns (doc_id, n_emails, n_phones, text_redacted). Phones are
    * counted on the email-redacted text — a phone-shaped substring
    * inside an email is swallowed by the [EMAIL] mask, so counting it
    * on the raw text would report a phantom unredacted phone; this way
    * n_emails/n_phones always equal the placeholder counts in
    * text_redacted.
    */
  def redactPii(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val emailMasked = regexp_replace(col(textCol), EmailRe, "[EMAIL]")
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(emailMasked, lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(emailMasked, PhoneRe, "[PHONE]").as("text_redacted"))
  }
}

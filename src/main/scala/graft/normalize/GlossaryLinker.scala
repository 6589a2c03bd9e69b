package graft.normalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.indel_ratio

/** Glossary linking (glossary_linker.py:43-102) and definition backfill
  * (validation/fixes.py:412-423, J-5).
  *
  * Definitions are a small dimension (a glossary) → broadcast; concepts
  * stream. Exact lower-case match wins; otherwise best fuzzy match with
  * indel_ratio ≥ 85 (rapidfuzz parity). Score ties break on the MIN
  * concept id — deterministic, but a documented divergence from
  * rapidfuzz process.extractOne's first-candidate-in-iteration-order
  * rule (glossary_linker.py:88-99), whose Python-set iteration order
  * is itself unstable across runs.
  */
object GlossaryLinker {

  /** (definition term → concept) links: exact, else fuzzy ≥ threshold.
    * @param definitions (term, definition)
    * @param concepts entity rows with label Concept
    * @return (term, concept_id, concept_name, score, matched)
    */
  def linkDefinitions(definitions: DataFrame, concepts: DataFrame,
                      threshold: Double = 85.0): DataFrame = {
    val defs = broadcast(definitions
      .select(lower(col("term")).as("term"), col("definition")).distinct())
    val c = concepts.filter(col("label") === "Concept")
      .select(col("id").as("concept_id"), col("name").as("concept_name"))

    val scored = c.crossJoin(defs)
      .select(col("term"), col("concept_id"), col("concept_name"),
        when(col("term") === col("concept_name"), lit(200.0))
          .otherwise(indel_ratio(col("term"), col("concept_name"))).as("score"))

    scored.groupBy(col("term"))
      .agg(
        max_by(col("concept_id"), struct(col("score"), -col("concept_id"))).as("concept_id"),
        max_by(col("concept_name"), struct(col("score"), -col("concept_id"))).as("concept_name"),
        max(col("score")).as("rawScore"))
      .filter(col("rawScore") >= threshold)
      .select(col("term"), col("concept_id"), col("concept_name"),
        least(col("rawScore"), lit(100.0)).as("score"),
        (col("rawScore") >= 200.0).as("exact"))
  }

  /** J-5: fill empty entity definitions from a case-insensitively
    * matching glossary term (fixes.py:412-423).
    */
  def backfillDefinitions(entities: DataFrame, definitions: DataFrame): DataFrame = {
    val defs = broadcast(definitions
      .groupBy(lower(col("term")).as("__term"))
      .agg(max_by(col("definition"), length(col("definition"))).as("__def")))
    entities
      .join(defs, lower(col("name")) === col("__term"), "left")
      .withColumn("definition",
        when(col("definition").isNull || length(col("definition")) === 0, col("__def"))
          .otherwise(col("definition")))
      .drop("__term", "__def")
  }
}

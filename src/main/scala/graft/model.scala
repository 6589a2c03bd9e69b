package graft

/** Core row types of the engine.
  *
  * The reference models a Neo4j property graph (labeled nodes, typed
  * relationships — /root/reference/src/graphrag_kg_pipeline/extraction/
  * schema.py:41-511). We map it to columnar Datasets: an entity table and
  * a typed edge table keyed by stable 64-bit vertex ids
  * (SURVEY.md §1.3).
  */
object model {

  /** A file row of the input corpus (BASELINE.json `input_hint`). */
  final case class CorpusFile(
      repo: String,
      path: String,
      commit: String,
      lang: String,
      content: String)

  /** One extracted/normalized entity.
    *
    * `id` is the stable vertex id = xxhash64(name, label) at extraction
    * grain; after dedup stages the id of the surviving (primary) row.
    * `displayName` preserves the pre-normalization surface form
    * (reference normalizer.py:170-180).
    */
  final case class Entity(
      id: Long,
      name: String,
      displayName: String,
      label: String,
      definition: String,
      aliases: Seq[String],
      sourceSpans: Seq[String])

  /** A typed directed relationship between two entity ids. */
  final case class TypedEdge(src: Long, dst: Long, relType: String)

  /** An untyped weighted graph edge (algorithm input). */
  final case class Edge(src: Long, dst: Long, weight: Double)

  /** The 12 LLM entity labels — extraction/schema.py:20-35. */
  val EntityLabels: Seq[String] = Seq(
    "Concept", "Challenge", "Artifact", "Bestpractice", "Processstage",
    "Role", "Standard", "Tool", "Methodology", "Industry", "Organization",
    "Outcome")

  /** The 14 semantic relationship types — extraction/schema.py:386-511;
    * community detection builds its graph over exactly these
    * (community_detection.py:120-154).
    */
  val SemanticRelTypes: Seq[String] = Seq(
    "ADDRESSES", "REQUIRES", "COMPONENT_OF", "RELATED_TO", "ALTERNATIVE_TO",
    "USED_BY", "APPLIES_TO", "PRODUCES", "DEFINES", "PREREQUISITE_FOR",
    "PUBLISHES", "REGULATES", "DEVELOPS", "ACHIEVES")

  /** The ~50 valid (src,rel,dst) label triples — extraction/schema.py:518-588. */
  val ValidPatterns: Seq[(String, String, String)] = Seq(
    ("Concept", "ADDRESSES", "Challenge"),
    ("Bestpractice", "ADDRESSES", "Challenge"),
    ("Tool", "ADDRESSES", "Challenge"),
    ("Methodology", "ADDRESSES", "Challenge"),
    ("Concept", "ADDRESSES", "Concept"),
    ("Concept", "REQUIRES", "Concept"),
    ("Concept", "REQUIRES", "Artifact"),
    ("Bestpractice", "REQUIRES", "Concept"),
    ("Processstage", "REQUIRES", "Artifact"),
    ("Tool", "REQUIRES", "Concept"),
    ("Standard", "REQUIRES", "Concept"),
    ("Standard", "REQUIRES", "Artifact"),
    ("Methodology", "REQUIRES", "Concept"),
    ("Methodology", "REQUIRES", "Artifact"),
    ("Artifact", "COMPONENT_OF", "Artifact"),
    ("Concept", "COMPONENT_OF", "Concept"),
    ("Processstage", "COMPONENT_OF", "Methodology"),
    ("Concept", "RELATED_TO", "Concept"),
    ("Challenge", "RELATED_TO", "Challenge"),
    ("Challenge", "RELATED_TO", "Concept"),
    ("Artifact", "RELATED_TO", "Artifact"),
    ("Standard", "RELATED_TO", "Standard"),
    ("Bestpractice", "RELATED_TO", "Concept"),
    ("Role", "RELATED_TO", "Concept"),
    ("Role", "RELATED_TO", "Role"),
    ("Tool", "RELATED_TO", "Concept"),
    ("Tool", "RELATED_TO", "Tool"),
    ("Organization", "RELATED_TO", "Organization"),
    ("Outcome", "RELATED_TO", "Outcome"),
    ("Methodology", "ALTERNATIVE_TO", "Methodology"),
    ("Tool", "ALTERNATIVE_TO", "Tool"),
    ("Concept", "ALTERNATIVE_TO", "Concept"),
    ("Role", "USED_BY", "Tool"),
    ("Role", "USED_BY", "Artifact"),
    ("Industry", "USED_BY", "Tool"),
    ("Industry", "USED_BY", "Methodology"),
    ("Standard", "APPLIES_TO", "Industry"),
    ("Methodology", "APPLIES_TO", "Industry"),
    ("Bestpractice", "APPLIES_TO", "Processstage"),
    ("Concept", "APPLIES_TO", "Processstage"),
    ("Organization", "APPLIES_TO", "Industry"),
    ("Processstage", "PRODUCES", "Artifact"),
    ("Role", "PRODUCES", "Artifact"),
    ("Standard", "DEFINES", "Concept"),
    ("Standard", "DEFINES", "Artifact"),
    ("Processstage", "PREREQUISITE_FOR", "Processstage"),
    ("Artifact", "PREREQUISITE_FOR", "Processstage"),
    ("Concept", "PREREQUISITE_FOR", "Concept"),
    ("Organization", "PUBLISHES", "Standard"),
    ("Organization", "REGULATES", "Industry"),
    ("Organization", "DEVELOPS", "Tool"),
    ("Concept", "ACHIEVES", "Outcome"),
    ("Bestpractice", "ACHIEVES", "Outcome"),
    ("Methodology", "ACHIEVES", "Outcome"),
    ("Tool", "ACHIEVES", "Outcome"))
}

package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.GraphOps
import graft.normalize.Normalize.Snapshot

/** The reference's non-vector read/retrieval surface
  * (examples/query_knowledge_graph.py:87-199, SURVEY.md §3.3).
  */
object ReadApi {

  /** Strategy 2: chunk→entity traversal with mention counts — top-k
    * entities by MENTIONED_IN frequency (:126-135, A-9).
    */
  def topMentionedEntities(s: Snapshot, mentionedIn: DataFrame, k: Int = 20): DataFrame =
    mentionedIn.groupBy(col("entity_id").as("id"))
      .agg(count(lit(1)).as("mentions"))
      .join(s.entities.select(col("id"), col("name"), col("label")), Seq("id"))
      .orderBy(col("mentions").desc, col("name"))
      .limit(k)
      .select(col("name"), col("label"), col("mentions"))

  /** Strategy 3: entity search by name CONTAINS with connection counts
    * (:154-169) — filter + degree join + top-k.
    */
  def entitySearch(s: Snapshot, term: String, k: Int = 10): DataFrame = {
    val deg = GraphOps.relationshipCounts(s.edges)
    s.entities
      .filter(lower(col("name")).contains(term.toLowerCase))
      .join(deg, Seq("id"), "left")
      .select(col("name"), col("label"),
        coalesce(col("relationship_count"), lit(0L)).as("connections"))
      .orderBy(col("connections").desc, col("name"))
      .limit(k)
  }

  /** Strategy 4: 1-hop neighborhood with direction flag (:184-199) —
    * `when(src === id, "->").otherwise("<-")`.
    */
  def neighborhood(s: Snapshot, name: String): DataFrame = {
    val target = s.entities.filter(col("name") === name).select(col("id"))
    val names = s.entities.select(col("id"), col("name"))
    val out = s.edges.join(target.withColumnRenamed("id", "src"), Seq("src"))
      .join(names.select(col("id").as("dst"), col("name").as("neighbor")), Seq("dst"))
      .select(col("relType"), lit("->").as("direction"), col("neighbor"))
    val in = s.edges.join(target.withColumnRenamed("id", "dst"), Seq("dst"))
      .join(names.select(col("id").as("src"), col("name").as("neighbor")), Seq("src"))
      .select(col("relType"), lit("<-").as("direction"), col("neighbor"))
    out.unionByName(in).distinct()
  }

  /** G-3: community materialization — member count + members per
    * community, skipping communities under minSize
    * (community_summarizer.py:56-78, 170-200).
    */
  def communities(s: Snapshot, labels: DataFrame, minSize: Int = 3): DataFrame =
    labels.join(s.entities.select(col("id"), col("name")), Seq("id"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("member_count"),
        array_sort(collect_list(col("name"))).as("members"))
      .filter(col("member_count") >= minSize)
}

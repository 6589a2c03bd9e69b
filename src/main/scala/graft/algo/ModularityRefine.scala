package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Louvain-style local-move refinement of a community partition — the
  * modularity-ascent half of the reference's Leiden detection
  * (community_detection.py:46-118 runs leidenalg, whose inner loop is
  * exactly this greedy node-move phase) applied on top of the G-2 LPA
  * stand-in. [[LabelPropagation]] optimizes label agreement, not
  * modularity; one refinement pass moves each vertex to the neighboring
  * community with the highest modularity gain, which measurably raises
  * Newman modularity over the raw LPA partition.
  *
  * Synchronous, deterministic, partition-count-independent schedule:
  *
  *   - candidate communities of vertex i = communities of its
  *     neighbors ∪ its own community A;
  *   - integer score S(C) = 2m·k_{i,C} − k_i·(Σtot(C) − [C=A]·k_i),
  *     the modularity gain ΔQ·(2m)² shifted by a per-vertex constant —
  *     argmax over C of S is argmax of ΔQ, and EXACT integer arithmetic
  *     makes the argmax reproducible in any engine (the DuckDB oracle
  *     replays it bit-for-bit; no float tie ambiguity);
  *   - ties: the current community wins, then the minimum community id;
  *   - PARITY GATING: round r applies moves only to vertices with
  *     id % 2 == (r−1) % 2. A synchronous all-vertex update can swap
  *     two adjacent vertices forever (each computes the other's stale
  *     community as best); alternating halves holds each vertex's
  *     neighborhood of opposite parity fixed, which breaks the 2-cycle
  *     the same way LPA's cap does, while staying deterministic —
  *     unlike the randomized vertex-fraction gating in distributed
  *     Louvain implementations.
  *
  * Scale shape: per round one (src ⨝ labels) shuffle-hash join +
  * map-side-combinable groupBy for k_{i,C} (identical exchange volume
  * to an LPA superstep), one skinny groupBy for Σtot, and a skinny
  * argmax — no window over the edge table, no collect. Long scores
  * hold while 2m·max_k < 2^63 (≈ any graph with 2m·k_hub below 9.2e18;
  * past that, widen S to DecimalType(38,0) — same plan shape).
  */
object ModularityRefine {

  final case class Result(labels: DataFrame, rounds: Int, converged: Boolean)

  /** @param symEdges symmetrized undirected edges (both directions). With
    *   `weighted=true` a BIGINT `w` column is required; a self-loop row
    *   (src=dst) must appear ONCE carrying TWICE its internal weight —
    *   exactly what [[Louvain.coarsen]]'s groupBy over both directions of
    *   the fine edges produces — so that k_i and 2m follow the Newman
    *   loop-counts-twice convention while the argmax stays integer-exact.
    * @param initial  (id, community) starting partition (e.g. LPA output)
    * @return (id, community) — community = min member vertex id
    */
  def run(spark: SparkSession,
          symEdges: DataFrame,
          initial: DataFrame,
          numPartitions: Int = 32,
          maxRounds: Int = 10,
          weighted: Boolean = false): Result = Superstep.withoutAQE(spark) {

    val wcol = if (weighted) col("w").cast("long") else lit(1L)
    val e = symEdges.select(col("src"), col("dst"), wcol.as("w"))
      .repartition(numPartitions, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val deg = e.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .repartition(numPartitions, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // = Σ k_i: each undirected edge appears twice (self-loops once, at 2w)
    val twoM = e.agg(sum(col("w"))).first().getLong(0)

    var labels = initial.select(col("id"), col("community"))
      .repartition(numPartitions, col("id"))
      .localCheckpoint(true)
    var round = 0
    var stillRuns = 0 // consecutive moveless half-sweeps; 2 = both parities
    var converged = false
    val gc = new Superstep.CheckpointGC(spark)

    while (round < maxRounds && !converged) {
      val ctot = labels.join(deg.hint("shuffle_hash"), Seq("id"))
        .groupBy(col("community")).agg(sum(col("k")).as("tot"))

      // k_{i,C}: neighbors of i per community C (self-loops excluded —
      // a supernode's internal weight moves with it, constant across
      // candidates, so it cancels from the argmax), plus a zero row for
      // i's own community so singletons and A-less neighborhoods still
      // score their current community
      val neigh = e.filter(col("src") =!= col("dst"))
        .join(labels.select(col("id").as("dst"), col("community").as("cand"))
          .hint("shuffle_hash"), Seq("dst"))
        .select(col("src").as("id"), col("cand"), col("w").as("kic"))
      val cand = neigh
        .unionByName(labels.select(col("id"), col("community").as("cand"),
          lit(0L).as("kic")))
        .groupBy(col("id"), col("cand")).agg(sum(col("kic")).as("kic"))

      val cur = labels.select(col("id"), col("community").as("cur"))
      val scored = cand
        .join(cur.hint("shuffle_hash"), Seq("id"))
        .join(deg.hint("shuffle_hash"), Seq("id"))
        .join(ctot.select(col("community").as("candc"), col("tot")),
          col("cand") === col("candc"))
        .select(col("id"), col("cand"),
          (lit(twoM) * col("kic") -
            col("k") * (col("tot") -
              when(col("cand") === col("cur"), col("k"))
                .otherwise(lit(0L)))).as("s"),
          when(col("cand") === col("cur"), lit(1L)).otherwise(lit(0L))
            .as("isa"))
      val winner = scored.groupBy(col("id"))
        .agg(max_by(col("cand"), struct(col("s"), col("isa"), -col("cand")))
          .as("best"))

      val next = labels.join(winner.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"),
          when(pmod(col("id"), lit(2L)) === lit(round % 2) &&
            col("best").isNotNull, col("best"))
            .otherwise(col("community")).as("community"),
          col("community").as("prev"))
        .localCheckpoint(false) // lazy: the changes count materializes it

      val changes = next.filter(col("community") =!= col("prev")).count()
      gc.tick()
      labels = next.select("id", "community")
      round += 1
      // a moveless half-sweep ends the ascent only once BOTH parities
      // were still back-to-back
      stillRuns = if (changes == 0L) stillRuns + 1 else 0
      converged = stillRuns >= 2
    }
    e.unpersist(); deg.unpersist(); gc.close()

    val canon = labels.groupBy(col("community").as("c")).agg(min(col("id")).as("nc"))
    val out = labels.join(canon, labels("community") === col("c"))
      .select(col("id"), col("nc").as("community"))
    Result(out, round, converged)
  }
}

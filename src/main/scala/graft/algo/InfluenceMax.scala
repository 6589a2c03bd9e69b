package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DegreeDiscountIC seed selection (Chen–Wang–Yang, KDD 2009) — the
  * deterministic influence-maximization heuristic that matches greedy
  * IC-model simulation to within a few percent at a millionth of the
  * cost: pick the vertex with the highest DISCOUNTED degree, where a
  * vertex already adjacent to t chosen seeds discounts its degree d to
  * dd = d − 2t − (d − t)·t·p under propagation probability p. The
  * seed-selection half of the influence pipeline whose evaluation
  * half is [[Cascade]] (select with degreeDiscount, measure spread
  * with Cascade.runFraction).
  *
  * p is a rational num/den and the score is kept ×den so everything
  * is EXACT BIGINT: S = den·d − 2·den·t − (d − t)·t·num. Ties break
  * to the minimum id — the whole seed sequence is deterministic and
  * engine-replayable.
  *
  * Scale shape: state is one row per vertex (id, deg, t, picked),
  * co-partitioned on id and checkpointed; each of the k rounds is a
  * TakeOrdered(1) argmax over a per-row score expression (no global
  * sort) + ONE skinny left join folding +1 into the picked vertex's
  * neighbors (deg(pick) rows cross the wire — the exchange tracks the
  * seed's degree, never |E|). The driver holds k (id, score) pairs.
  */
object InfluenceMax {

  /** @param seeds (rank, id, score) — the pick sequence
    * @param state (id, deg, tv, picked) — final discount state: tv =
    *   how many picks are adjacent (the update path's full surface,
    *   verified cross-engine even when no discounted vertex wins)
    */
  final case class Result(seeds: DataFrame, state: DataFrame)

  def degreeDiscount(spark: SparkSession,
                     symEdges: DataFrame,
                     k: Int,
                     pNum: Long = 1L, pDen: Long = 10L,
                     numPartitions: Int = 32,
                     checkpointEvery: Int = 8): Result = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pDen > 0 && pNum >= 0 && pNum <= pDen,
      s"p must be a fraction in [0,1], got $pNum/$pDen")
    val e = symEdges.select(col("src"), col("dst"))
      .repartition(numPartitions, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var state = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .select(col("id"), col("deg"), lit(0L).as("tv"), lit(false).as("picked"))
      .repartition(numPartitions, col("id"))
      .localCheckpoint(true)
    var lastCp = state

    val score = lit(pDen) * col("deg") - lit(2L * pDen) * col("tv") -
      (col("deg") - col("tv")) * col("tv") * lit(pNum)

    val picks = Seq.newBuilder[(Long, Long, Long)]
    var r = 0
    while (r < k) {
      val top = state.filter(!col("picked"))
        .withColumn("score", score)
        .orderBy(desc("score"), asc("id")).limit(1)
        .select("id", "score").head()
      val (pickId, pickScore) = (top.getLong(0), top.getLong(1))
      picks += ((r.toLong, pickId, pickScore))

      val nbrs = e.filter(col("src") === pickId)
        .select(col("dst").as("id"), lit(1L).as("inc"))
      val next = state.join(nbrs.hint("shuffle_hash"), Seq("id"), "left")
        .select(col("id"), col("deg"),
          (col("tv") + coalesce(col("inc"), lit(0L))).as("tv"),
          (col("picked") || col("id") === pickId).as("picked"))
      state =
        if ((r + 1) % checkpointEvery == 0) {
          val cp = next.localCheckpoint(true)
          Superstep.freeCheckpoint(lastCp)
          lastCp = cp
          cp
        } else next
      r += 1
    }
    e.unpersist()
    import spark.implicits._
    Result(picks.result().toDF("rank", "id", "score"), state)
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gonzalez farthest-first traversal (1985) — the 2-approximate
  * k-center coreset selector: pick k points so every corpus point is
  * within the minimal-possible-×2 radius of a pick. The
  * corpus-spanning diversity op a training-data pipeline runs to seed
  * balanced clusters, pick prototype documents, or build an
  * embedding-space coverage set (the corpus-scale complement of the
  * page-scale MMR reranker).
  *
  * All selection arithmetic is EXACT BIGINT: vector components are
  * integerized once at the proven 5dp cosine-parity grain
  * (round(x·10⁵), HALF_UP ≡ round-half-away-from-zero for the
  * double-exact products both engines compute), so squared L2
  * distances are exact integers and the greedy argmax — ties to the
  * minimum id — is bit-deterministic and engine-replayable. At 64
  * dims and |x| < 1 the distance bound is 64·(2·10⁵)² < 2⁶³.
  *
  * Scale shape: the corpus-scale state (id, iv, bestD, bestC) is
  * cached once; each of the k rounds is ONE map-only projection
  * (fold the new center's distance into the running minimum — never a
  * rescan of all selected centers) plus two tiny actions: a 1-row
  * center-vector collect and a TakeOrdered(1) argmax (per-partition
  * top-1, no global sort). No shuffle at all after the initial cache;
  * the driver loop holds k center ids, never data.
  */
object Coreset {

  /** Components integerized at the 5dp parity grain. */
  def intVec(vec: Column, scale: Long = 100000L): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Exact squared L2 distance of two integerized vectors — the
    * codegen'd native kernel (same left-to-right BIGINT accumulation
    * as the old `aggregate(zip_with(...))` form, so values are
    * bit-identical; the HOF form was a CodegenFallback that dominated
    * the NN-Descent build cost).
    */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.sq_dist_long(a, b)

  /** @param centers (rank, id, dist_sq) — dist_sq is the point's
    *   distance to the previously-selected set at pick time (rank 0 =
    *   the seed, dist_sq 0); the NEXT pick's dist_sq after round k is
    *   the k-center radius².
    * @param assignment (id, center_id, dist_sq) — the Voronoi
    *   partition of the corpus over the selected centers.
    */
  final case class Result(centers: DataFrame, assignment: DataFrame)

  def kCenters(vecs: DataFrame, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               scale: Long = 100000L, checkpointEvery: Int = 8): Result = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = vecs.sparkSession
    var state = vecs
      .select(col(idCol).as("id"), intVec(col(vecCol), scale).as("iv"),
        lit(Long.MaxValue).as("bestD"), lit(-1L).as("bestC"))
      .localCheckpoint(true)

    var lastCp = state
    // seed: the minimum id (any start point is a valid Gonzalez seed;
    // this one needs no arbitrary tie policy)
    var nextId = state.agg(min("id")).head().getLong(0)
    var nextD = 0L
    val centers = Seq.newBuilder[(Long, Long, Long)]
    var r = 0
    while (r < k) {
      centers += ((r.toLong, nextId, nextD))
      val cvec = state.filter(col("id") === nextId)
        .select("iv").head().getSeq[Long](0)
      val cLit = array(cvec.map(lit): _*)
      val next = state
        .withColumn("d2", sqDist(col("iv"), cLit))
        .select(col("id"), col("iv"),
          least(col("bestD"), col("d2")).as("bestD"),
          when(col("d2") < col("bestD"), lit(nextId))
            .otherwise(col("bestC")).as("bestC"))
      state =
        if ((r + 1) % checkpointEvery == 0) {
          val cp = next.localCheckpoint(true) // eager: materialize, THEN free the parent
          graft.algo.Superstep.freeCheckpoint(lastCp)
          lastCp = cp
          cp
        } else next
      r += 1
      if (r < k) {
        val top = state.orderBy(desc("bestD"), asc("id")).limit(1)
          .select("id", "bestD").head()
        nextId = top.getLong(0)
        nextD = top.getLong(1)
      }
    }
    import spark.implicits._
    Result(
      centers.result().toDF("rank", "id", "dist_sq"),
      state.select(col("id"), col("bestC").as("center_id"),
        col("bestD").as("dist_sq")))
  }
}

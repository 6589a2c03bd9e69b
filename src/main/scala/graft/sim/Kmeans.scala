package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-arithmetic distributed Lloyd k-means over an embedding
  * column — the clustering half of the coreset/IVF family with EVERY
  * iteration engine-replayable: vectors integerize once at the 5dp
  * parity grain (the Coreset discipline), and each round's centroids
  * are ROUNDED BACK TO THE INTEGER GRID (HALF_UP per component of the
  * exact-integer sum / count division), so assignments are plain
  * BIGINT squared-distance argmins with ties to the smaller cluster
  * id — no floating-point comparison anywhere in the loop, identical
  * under any partitioning and in any engine. Grid rounding perturbs
  * the classic Lloyd update by ≤ half a grid cell per component —
  * noise at the 1e-5 scale of unit-norm embeddings — in exchange for
  * bit-determinism.
  *
  * Scale shape: per iteration ONE broadcast of the k integer
  * centroids onto the corpus (map-only argmin over k literals — no
  * join, no shuffle on the corpus side) + one map-side-combinable
  * (cluster, dim-wise sum) aggregate. Initialization = the k
  * smallest ids (callers wanting coverage seeds pass
  * [[Coreset.kCenters]] picks instead).
  */
object Kmeans {

  /** @param assignment (id, cluster, dist_sq) after the final round
    * @param centroids  (cluster, cvec) — integerized grid centroids
    */
  final case class Result(assignment: DataFrame, centroids: DataFrame)

  def run(vecs: DataFrame, k: Int, iters: Int = 3,
          idCol: String = "vec_id", vecCol: String = "embedding",
          scale: Long = 100000L,
          seeds: Option[Seq[Long]] = None): Result = {
    require(k >= 1 && iters >= 0, s"bad k=$k / iters=$iters")
    val pts = vecs
      .select(col(idCol).as("id"), Coreset.intVec(col(vecCol), scale).as("iv"))
      .localCheckpoint(true)

    val seedIds = seeds.getOrElse(
      pts.select(col("id")).orderBy(col("id")).limit(k)
        .collect().map(_.getLong(0)).toSeq)
    var cents: Seq[(Long, Seq[Long])] = pts
      .filter(col("id").isInCollection(seedIds))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => i.toLong -> v }

    def assignExpr(cs: Seq[(Long, Seq[Long])]): (Column, Column) = {
      // packed (dist_sq, cluster) argmin over k literal centroids:
      // dist_sq < 2^40 at 64 dims, k < 2^20 → key fits BIGINT
      val keys = cs.map { case (c, v) =>
        Coreset.sqDist(col("iv"), array(v.map(lit): _*)) * lit(1048576L) + c
      }
      val best = keys.reduce((a, b) => least(a, b))
      (pmod(best, lit(1048576L)).as("cluster"),
       (best / lit(1048576L)).cast("long").as("dist_sq"))
    }

    var it = 0
    while (it < iters) {
      val (cl, _) = assignExpr(cents)
      val assigned = pts.select(col("id"), col("iv"), cl)
      val sums = assigned
        .select(col("cluster"), posexplode(col("iv")).as(Seq("d", "x")))
        .groupBy(col("cluster"), col("d"))
        .agg(sum(col("x")).as("sv"), count(lit(1)).as("n"))
        .groupBy(col("cluster"))
        .agg(sort_array(collect_list(struct(col("d"), col("sv"), col("n"))))
          .as("parts"))
        .select(col("cluster"),
          transform(col("parts"),
            p => round(p.getField("sv").cast("double") / p.getField("n"), 0)
              .cast("long")).as("cvec"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // empty clusters keep their previous centroid (deterministic)
      cents = cents.map { case (c, v) => c -> sums.getOrElse(c, v) }
      it += 1
    }

    val (cl, d2) = assignExpr(cents)
    val assignment = pts.select(col("id"), cl, d2)
    import vecs.sparkSession.implicits._
    Result(assignment, cents.toDF("cluster", "cvec"))
  }
}

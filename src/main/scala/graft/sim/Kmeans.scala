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
    require(k <= 1048576, s"k=$k exceeds the 2^20 cluster-id pack field")
    val pts = vecs
      .select(col(idCol).as("id"), Coreset.intVec(col(vecCol), scale).as("iv"))
      .localCheckpoint(true)

    // Fail fast on pack overflow (ADVICE r3): the argmin key is
    // dist_sq * 2^20 + cluster, and dist_sq ≤ dims · (2·max|iv|)² (the
    // worst case between a point and a grid centroid, both bounded by
    // the data's own max component). Unnormalized embeddings or high
    // dims would otherwise WRAP silently in Spark's long arithmetic
    // and mis-assign clusters. One skinny agg over the checkpointed
    // points — driver-side, once per run.
    val bound = pts.agg(
      max(size(col("iv"))).as("dims"),
      max(aggregate(col("iv"), lit(0L),
        (a, v) => greatest(a, abs(v)))).as("maxAbs")).first()
    if (!bound.isNullAt(0)) {
      val dims = bound.getInt(0).toLong
      val maxAbs = bound.getLong(1)
      require(
        BigInt(dims) * (BigInt(2) * maxAbs).pow(2) * BigInt(1048576) +
          k <= BigInt(Long.MaxValue),
        s"argmin pack overflow: dims=$dims max|iv|=$maxAbs at scale=" +
          s"$scale — lower `scale` or reduce dimensionality")
    }

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
      // exact unpack: long `/` routes through double (inexact past
      // 2^53, and the packed key reaches 2^59) — shift instead
      (pmod(best, lit(1048576L)).as("cluster"),
       shiftright(best, 20).as("dist_sq"))
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

  /** Per-cluster quality rollup — SIMPLIFIED silhouette (centroid
    * distances stand in for mean pairwise distances: the O(n·k) form
    * that scales where the classic O(n²) cannot) plus inertia:
    * s(x) = (b − a)/max(a, b) with a = dist to the own centroid,
    * b = dist to the nearest other centroid; distances are IEEE
    * sqrts of exact BIGINT d², means are one fp sum per cluster
    * sealed at 6dp (the hyperball-harmonic precedent). Map-only per
    * point (the k centroids ride as literals, sorted per row) + one
    * cluster-grain aggregate.
    *
    * @return (cluster, n_points, inertia, mean_silhouette)
    */
  def quality(vecs: DataFrame, k: Int, iters: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding",
              scale: Long = 100000L): DataFrame = {
    // the silhouette b-term reads the SECOND-nearest centroid — with
    // k = 1 (or centroids collapsing to < 2 distinct) it would be a
    // silent NULL instead of a score (ADVICE r3)
    require(k >= 2, s"quality() needs k >= 2 for the nearest-other " +
      s"centroid term, got k=$k")
    val res = run(vecs, k, iters, idCol, vecCol, scale)
    val cents = res.centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toSeq.sortBy(_._1)
    val pts = vecs.select(col(idCol).as("id"),
      Coreset.intVec(col(vecCol), scale).as("iv"))
    val keys = array(cents.map { case (c, v) =>
      Coreset.sqDist(col("iv"), array(v.map(lit): _*)) * lit(1048576L) + c
    }: _*)
    val sorted = array_sort(keys)
    val a = sqrt(shiftright(element_at(sorted, 1), 20).cast("double"))
    val b = sqrt(shiftright(element_at(sorted, 2), 20).cast("double"))
    pts.select(
        pmod(element_at(sorted, 1), lit(1048576L)).as("cluster"),
        shiftright(element_at(sorted, 1), 20).as("d2"),
        when(greatest(a, b) > 0.0, (b - a) / greatest(a, b))
          .otherwise(lit(0.0)).as("s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"), sum(col("d2")).as("inertia"),
        round(sum(col("s")) / count(lit(1)), 6).as("mean_silhouette"))
  }
}

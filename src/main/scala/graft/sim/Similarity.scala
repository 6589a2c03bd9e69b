package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`embeddings(vec_id, embedding ARRAY<FLOAT>, label)`).
  *
  * Baseline: brute-force cosine top-k (exact, broadcast the query set —
  * at 100 TB the corpus side streams, only queries are replicated).
  * Scale path: IVF — k coarse centroids, assign every vector to its
  * nearest centroid once, probe only the nProbe nearest cells per
  * query; turns the O(|Q|·N) scan into O(|Q|·N·nProbe/k).
  * Dot products are codegen'd `aggregate(zip_with(...))` — no UDFs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb)).otherwise(lit(0.0))
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Scores rounded to 5dp BEFORE ranking; ties break on neighbor id —
    * fully deterministic, engine-independent ordering.
    * Returns (query_id, neighbor_id, score, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 5).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF index: nearest-centroid assignment of every corpus vector.
    * Centroids are a deterministic sample (every `stride`-th id).
    */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = broadcast(centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cv")))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(c)
      .select(col(idCol), col(vecCol), col("centroid_id"),
        cosine(col(vecCol), col("cv")).as("cscore"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("cscore").desc, col("centroid_id"))))
      .filter(col("r") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF-probed ANN top-k: search only the nProbe nearest cells of each
    * query. Returns same shape as [[bruteForceTopK]] (approximate).
    */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
              k: Int = 5, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, centroids, idCol, vecCol)
    val c = broadcast(centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cv")))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(c)
      .select(col("query_id"), col("qv"), col("centroid_id"),
        cosine(col("qv"), col("cv")).as("cscore"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cscore").desc, col("centroid_id"))))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))

    val scored = probes.join(assigned, Seq("centroid_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("qv"), col(vecCol)), 5).as("score"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, LSH-style
    * bucketing by random-hyperplane sign bits to avoid O(n²): vectors
    * agreeing on a `bits`-bit signature are compared exactly.
    * Hyperplanes are deterministic xxhash64-derived pseudo-vectors.
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double = 0.95, bits: Int = 8,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // sign bit b = sign(Σ_j v_j * h(b, j)) with h a ±1 pseudo-random seq
    val sig = (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), size(col(vecCol)) - 1),
            j => when(pmod(xxhash64(lit(b), j), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

    val bucketed = corpus.select(col(idCol), col(vecCol), sig.as("bucket"))
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bucket") === col("r.bucket") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        round(cosine(col(s"l.$vecCol"), col(s"r.$vecCol")), 5).as("score"))
      .filter(col("score") >= threshold)
  }
}

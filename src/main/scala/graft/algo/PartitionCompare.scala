package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-agreement scoring: the Adjusted Rand Index (Hubert &
  * Arabie 1985) between two clusterings of the same vertex set — the
  * standard "did Louvain and LPA actually find the same structure /
  * how much did this run drift from the last one" evaluation the
  * community stack needs once it has more than one detector.
  *
  * Everything up to the final division is exact integer algebra.
  * With A = Σ n_ij(n_ij−1), a = Σ a_i(a_i−1), b = Σ b_j(b_j−1) and
  * N = n(n−1) (all DOUBLED pair counts, so no halving ever happens),
  * the closed form clears every fraction:
  *
  *   ARI = 2·(N·A − a·b) / (N·(a + b) − 2·a·b)
  *
  * — ONE fp division of two DECIMAL(38,0) values, so the DuckDB twin
  * hash-matches bit-for-bit. Degenerate denominator (both partitions
  * a single cluster, or all-singletons on both sides): ARI = 1 when
  * the contingency agrees perfectly (A = a = b), else null.
  *
  * Scale shape: one vertex-keyed equi-join of the two label tables,
  * one map-side-combinable (c1, c2) count, two cluster-grain marginal
  * aggregations, three 1-row totals — nothing super-linear. (The
  * DECIMAL(38) products bound exactness to n ≲ 10⁹ vertices; past
  * that the final ratio degrades to double precision, which is all
  * any consumer of a [−1, 1] score needs.)
  */
object PartitionCompare {

  /** @param left (id, community) — first partition
    * @param right (id, community) — second partition, same id set
    * @return one row (n, pairs_both, pairs_left, pairs_right, ari)
    *   where pairs_* are the same-cluster pair counts Σ C(t, 2)
    */
  def ari(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("id"), col("community").as("c1"))
    val r = right.select(col("id"), col("community").as("c2"))
    def d2(t: org.apache.spark.sql.Column) = // doubled pair count Σ t(t−1)
      sum(t.cast("decimal(38,0)") * (t - 1))

    val cont = l.join(r, Seq("id"))
      .groupBy(col("c1"), col("c2")).agg(count(lit(1)).as("nij"))
    val cells = cont.agg(sum(col("nij")).as("n"), d2(col("nij")).as("pb2"))
    val ag = cont.groupBy(col("c1")).agg(sum(col("nij")).as("t"))
      .agg(d2(col("t")).as("pl2"))
    val bg = cont.groupBy(col("c2")).agg(sum(col("nij")).as("t"))
      .agg(d2(col("t")).as("pr2"))

    val bigN = col("n").cast("decimal(38,0)") * (col("n") - 1)
    val num = lit(2) * (bigN * col("pb2") - col("pl2") * col("pr2"))
    val den = bigN * (col("pl2") + col("pr2")) - lit(2) * col("pl2") * col("pr2")
    cells.crossJoin(ag).crossJoin(bg)
      .select(col("n"),
        expr("CAST(pb2 AS BIGINT) DIV 2").as("pairs_both"),
        expr("CAST(pl2 AS BIGINT) DIV 2").as("pairs_left"),
        expr("CAST(pr2 AS BIGINT) DIV 2").as("pairs_right"),
        round(when(den.cast("double") =!= 0.0,
          num.cast("double") / den.cast("double"))
          .when(col("pb2") === col("pl2") && col("pl2") === col("pr2"), lit(1.0)),
          6).as("ari"))
  }
}

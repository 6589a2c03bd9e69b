package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact induced 4-node motif spectrum — the graphlet census one step
  * up from triangles (Pržulj's graphlets G₃–G₈ restricted to the six
  * CONNECTED 4-vertex shapes): 3-path, claw (star), paw (tailed
  * triangle), 4-cycle, diamond, 4-clique. The motif frequency vector
  * is the classic structural fingerprint of a link graph (web vs
  * social vs citation graphs separate cleanly on it).
  *
  * Strategy: count each shape as a SUBGRAPH via closed-form
  * identities over cheap aggregates, then Möbius-invert down the
  * containment lattice to INDUCED counts — no 4-set enumeration
  * anywhere. Subgraph counts:
  *
  *   claw    Σ_v C(d(v), 3)                                one degree agg
  *   paw     Σ_v t(v)·(d(v)−2)            per-vertex triangles ⨝ degrees
  *   path4   Σ_{uv∈E} (d(u)−1)(d(v)−1) − 3T      one edge-degree join
  *   diamond Σ_e C(sup(e), 2)             per-edge triangle support agg
  *   cycle4  [[Triangles.countRectangles]]         co-degree diagonal id
  *   clique4 [[Triangles.countCliques4]]      triangle-list corner join
  *
  * Möbius inversion (constants = how many copies of each smaller
  * shape a larger induced shape contains, verified by brute force in
  * MotifsSpec):
  *
  *   clique4ᵢ = clique4
  *   diamondᵢ = diamond − 6·clique4
  *   cycle4ᵢ  = cycle4 − diamondᵢ − 3·clique4
  *   pawᵢ     = paw − 4·diamondᵢ − 12·clique4
  *   clawᵢ    = claw − pawᵢ − 2·diamondᵢ − 4·clique4
  *   path4ᵢ   = path4 − 2·pawᵢ − 4·cycle4ᵢ − 6·diamondᵢ − 12·clique4
  *
  * Scale shape: one triangle enumeration (shared via checkpoint by
  * the global count, the per-vertex counts and the per-edge support),
  * one degree aggregation, one edge⨝degree join, plus the rectangle
  * and 4-clique kernels — every aggregate is map-side combinable and
  * the only super-linear surfaces are the two kernels' documented
  * wedge/triangle-pair self-joins (capped via the pass-through
  * parameters; exactness requires the caps to clear the true maxima,
  * the same explicit recall trade the kernels document). Degree
  * products accumulate in DECIMAL(38,0) so hub degrees cannot
  * overflow the ANSI BIGINT multiply.
  */
object Motifs {

  /** @param undirectedPairs undirected edges (any orientation;
    *                        canonicalized + deduplicated here)
    * @return six rows (motif, subgraphs, induced) — subgraph count =
    *         copies as a (not necessarily induced) subgraph
    */
  def fourNode(spark: SparkSession,
               undirectedPairs: DataFrame,
               numPartitions: Int = 32,
               maxCenterDegree: Long = 0,
               maxEdgeTriangles: Long = 0): DataFrame = {
    val pairs = Superstep.freshCheckpoint(
      undirectedPairs.select(
        least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(numPartitions, col("src"), col("dst")), eager = true)
    val sym = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = Superstep.freshCheckpoint(
      sym.groupBy(col("src").as("id"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("d")), eager = true)

    def dec(e: String) = expr(e).cast("decimal(38,0)")

    // claw subgraphs: Σ C(d,3); d(d−1)(d−2) is divisible by 6 per term
    val clawSub = deg.agg(
      sum(dec("d * (d - 1) * (d - 2) / 6")).as("s")).first()
    // path4 subgraphs: Σ_{uv∈E}(d(u)−1)(d(v)−1), the 3T comes off below
    val pathRaw = pairs
      .join(deg.select(col("id").as("src"), col("d").as("dsrc")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("d").as("ddst")), Seq("dst"))
      .agg(sum(dec("(dsrc - 1) * (ddst - 1)")).as("s")).first()

    // one triangle enumeration, three consumers
    val tri = Superstep.freshCheckpoint(
      Triangles.enumerate(pairs, numPartitions), eager = true)
    val t = tri.count()
    // paw subgraphs: per-corner (d−2) over the triangle incidences
    val pawSub = tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).cast("decimal(38,0)").as("t"))
      .join(deg, Seq("id"))
      .agg(sum(dec("t * (d - 2)")).as("s")).first()
    // diamond subgraphs: Σ_e C(sup(e), 2) over canonical edge support
    // (enumerate's corners are (degree, id)-ordered, so re-canonicalize)
    val diamondSub = tri.select(explode(array(
        array(col("u"), col("v")), array(col("u"), col("w")),
        array(col("v"), col("w")))).as("e"))
      .select(least(col("e")(0), col("e")(1)).as("a"),
        greatest(col("e")(0), col("e")(1)).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("s"))
      .agg(sum(expr("s * (s - 1) DIV 2")).as("s")).first()
    Superstep.freeCheckpoint(tri)

    val c4 = Triangles.countRectangles(spark, pairs, numPartitions,
      maxCenterDegree)
    val k4 = Triangles.countCliques4(spark, pairs, numPartitions,
      maxEdgeTriangles)
    Superstep.freeCheckpoint(pairs)
    Superstep.freeCheckpoint(deg)

    def v(r: org.apache.spark.sql.Row): Long =
      if (r.isNullAt(0)) 0L else r.getDecimal(0).longValueExact()
    val claw = v(clawSub)
    val path4 = v(pathRaw) - 3L * t
    val paw = v(pawSub)
    val dia = if (diamondSub.isNullAt(0)) 0L else diamondSub.getLong(0)

    val k4i = k4
    val diaI = dia - 6L * k4i
    val c4i = c4 - diaI - 3L * k4i
    val pawI = paw - 4L * diaI - 12L * k4i
    val clawI = claw - pawI - 2L * diaI - 4L * k4i
    val pathI = path4 - 2L * pawI - 4L * c4i - 6L * diaI - 12L * k4i

    spark.createDataFrame(Seq(
      ("path4", path4, pathI),
      ("claw", claw, clawI),
      ("paw", paw, pawI),
      ("cycle4", c4, c4i),
      ("diamond", dia, diaI),
      ("clique4", k4, k4i)))
      .toDF("motif", "subgraphs", "induced")
  }

  /** Motif significance against the configuration-model null: the
    * expected SUBGRAPH count of a shape H with vertex degrees kᵢ,
    * e(H) edges and aut(H) automorphisms under random degree-
    * preserving rewiring is, to leading order,
    *
    *   E[X_H] ≈ (Π_i m_{kᵢ}) / (aut(H) · M₁^{e(H)})
    *
    * with falling-factorial degree moments m_k = Σ_v d(d−1)…(d−k+1)
    * (M₁ = m₁). The observed/expected ratio is the classic motif
    * profile (Milo et al.): ≫1 = the wiring concentrates the shape
    * (triadic closure, bipartite cores), ≈1 = degree sequence alone
    * explains it. `claw` is the built-in sanity row: its observed
    * subgraph count IS m₃/6, so its ratio is exactly 1.
    *
    * One extra pass over the degree table (three map-side-combinable
    * DECIMAL moment sums); observed counts ride [[fourNode]]. The
    * formula arithmetic runs on exact integer moments in the same
    * operation order in both engines, so ratios are bit-stable.
    */
  def nullModelRatios(spark: SparkSession,
                      undirectedPairs: DataFrame,
                      numPartitions: Int = 32,
                      maxCenterDegree: Long = 0,
                      maxEdgeTriangles: Long = 0): DataFrame = {
    val observed = fourNode(spark, undirectedPairs, numPartitions,
      maxCenterDegree, maxEdgeTriangles)
    val pairs = undirectedPairs.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val sym = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("d"))
    val m = deg.agg(
      sum(col("d")).as("m1"),
      sum(expr("d * (d - 1)").cast("decimal(38,0)")).as("m2"),
      sum(expr("d * (d - 1) * (d - 2)").cast("decimal(38,0)")).as("m3"))
      .first()
    val m1 = m.getDecimal(0).doubleValue()
    val m2 = if (m.isNullAt(1)) 0.0 else m.getDecimal(1).doubleValue()
    val m3 = if (m.isNullAt(2)) 0.0 else m.getDecimal(2).doubleValue()

    // (degrees kᵢ; e(H); aut(H)) per shape, expectation in the same
    // op order both engines replay: products left-to-right, one divide
    val expected: Map[String, Double] = Map(
      "path4" -> m1 * m2 * m2 * m1 / (2.0 * m1 * m1 * m1), // (1,2,2,1) e=3 aut=2
      "claw" -> m1 * m1 * m1 * m3 / (6.0 * m1 * m1 * m1), // (1,1,1,3) e=3 aut=6
      "paw" -> m1 * m2 * m2 * m3 / (2.0 * m1 * m1 * m1 * m1), // (1,2,2,3) e=4 aut=2
      "cycle4" -> m2 * m2 * m2 * m2 / (8.0 * m1 * m1 * m1 * m1), // (2,2,2,2) e=4 aut=8
      "diamond" -> m2 * m2 * m3 * m3 / (4.0 * m1 * m1 * m1 * m1 * m1), // (2,2,3,3) e=5 aut=4
      "clique4" -> m3 * m3 * m3 * m3 / (24.0 * m1 * m1 * m1 * m1 * m1 * m1)) // (3,3,3,3) e=6 aut=24

    val expCol = expected.foldLeft(lit(Double.NaN)) { case (acc, (name, e)) =>
      when(col("motif") === name, lit(e)).otherwise(acc)
    }
    observed.select(col("motif"), col("subgraphs"),
      round(expCol, 6).as("expected"),
      when(expCol > 0.0, round(col("subgraphs") / expCol, 6)).as("ratio"))
  }
}

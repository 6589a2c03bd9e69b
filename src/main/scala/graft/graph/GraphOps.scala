package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model
import graft.normalize.Normalize.Snapshot

/** Edge-table builders (G-1) and degree/partition helpers (SURVEY.md §2.7).
  *
  * The community graph in the reference is name-keyed: it exports
  * DISTINCT (source name, target name) over the 14 semantic relationship
  * types and builds an UNDIRECTED igraph from the pairs
  * (community_detection.py:120-154, 85). Here the same projection yields
  * a columnar vertex dictionary (id, name) with id = xxhash64(name) and
  * a distinct directed edge table; `symmetrize` produces the undirected
  * view the iterative algorithms consume. Self-loops (possible after
  * dedup merges) are dropped.
  */
object GraphOps {

  final case class GraphTables(vertices: DataFrame, edges: DataFrame)

  /** J-1/G-1 semantic-edge projection over a normalized snapshot.
    *
    * Edges carry the north-star `(src, dst, weight)` shape: weight =
    * number of distinct semantic relationship TYPES between the name
    * pair (the reference's igraph is unweighted over DISTINCT pairs —
    * community_detection.py:120-154 — so algorithms default to treating
    * every edge as 1; the weight column feeds the weighted PageRank
    * variant).
    */
  def semanticGraph(s: Snapshot): GraphTables = {
    val sem = s.edges.filter(col("relType").isin(model.SemanticRelTypes: _*))
    val names = s.entities.select(col("id"), col("name"))
    // the weighted name-pair list is the shared parent of BOTH outputs;
    // without the (lazy) checkpoint, materializing vertices and edges
    // separately recomputes the join+agg twice (graph_build measured
    // 17s vs 2.3s for one pass at sf0.1). At cluster scale this is the
    // natural Iceberg commit point for the projected edge table.
    val pairs = sem
      .join(names.withColumnRenamed("id", "src").withColumnRenamed("name", "srcName"), Seq("src"))
      .join(names.withColumnRenamed("id", "dst").withColumnRenamed("name", "dstName"), Seq("dst"))
      .select(col("srcName"), col("dstName"), col("relType"))
      .filter(col("srcName").isNotNull && col("dstName").isNotNull)
      .groupBy(col("srcName"), col("dstName"))
      .agg(countDistinct(col("relType")).cast("double").as("weight"))
      .localCheckpoint(false)

    val vertices = pairs.select(col("srcName").as("name"))
      .union(pairs.select(col("dstName").as("name")))
      .distinct()
      .select(xxhash64(col("name")).as("id"), col("name"))

    val edges = pairs.select(
      xxhash64(col("srcName")).as("src"),
      xxhash64(col("dstName")).as("dst"),
      col("weight"))
      .filter(col("src") =!= col("dst"))

    GraphTables(vertices, edges)
  }

  /** Dictionary-id collision check. Vertex ids are xxhash64(name):
    * negligible risk at test scale but real at 10^10+ names (birthday
    * bound ≈ 4·10^9 for 64-bit). Returns colliding (id, names) groups —
    * must be empty; at full scale this runs piggybacked on the same
    * shuffle that builds the vertex dictionary, and a non-empty result
    * fails the job before any algorithm consumes the graph.
    */
  def idCollisions(vertices: DataFrame): DataFrame =
    vertices.groupBy(col("id"))
      .agg(countDistinct(col("name")).as("n"),
        array_sort(collect_set(col("name"))).as("names"))
      .filter(col("n") > 1)

  /** Undirected view: both directions, self-loops dropped, distinct. */
  def symmetrize(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Undirected view preserving edge weights: both directions, max
    * weight where both orientations exist, self-loops dropped.
    */
  def symmetrizeWeighted(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"), col("weight"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst")).agg(max(col("weight")).as("weight"))

  /** Canonical undirected pair form (u < v), one row per edge. */
  def undirectedPairs(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Undirected degree per vertex (each incident edge counted once). */
  def degrees(symEdges: DataFrame): DataFrame =
    symEdges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** A-4 Neo4j-style degree over the typed edge table:
    * count of incident relationships per entity, direction-agnostic
    * (entity_cleanup.py:479-490).
    */
  def relationshipCounts(typedEdges: DataFrame): DataFrame =
    typedEdges
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("relationship_count"))

  /** One-row structural profile of an undirected graph: vertex/edge
    * counts, degree extremes/mean, and degree assortativity (Newman
    * 2002 — the Pearson correlation of endpoint degrees over directed
    * symmetric edges; negative = hubs attach to leaves). All the
    * correlation's moments are EXACT BIGINT sums of integer degrees
    * (Se, Σd_u, Σd_u², Σd_u·d_v), so both engines agree bit-for-bit
    * until the single final division — 6dp rounding seals parity.
    * Cost: one degree aggregation + one edge⨝degree join, both
    * map-side combinable; scale-free. The final moment PRODUCTS
    * (Se·Sxy, Sx²) hold in int64 while 2m·Σd_u d_v < 2⁶³; past that
    * cast the four sums to DecimalType(38,0) — same plan shape.
    */
  def graphSummary(symEdges: DataFrame): DataFrame = {
    val deg = degrees(symEdges)
    val joined = symEdges
      .join(deg.select(col("id").as("src"), col("degree").as("du")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), Seq("dst"))
    joined.agg(
      count_distinct(col("src")).as("n_vertices"),
      (count(lit(1)) / 2).cast("long").as("n_edges"),
      min(col("du")).as("min_degree"),
      max(col("du")).as("max_degree"),
      count(lit(1)).as("se"),
      sum(col("du")).as("sx"),
      sum(col("du") * col("du")).as("sxx"),
      sum(col("du") * col("dv")).as("sxy"))
      .select(col("n_vertices"), col("n_edges"),
        col("min_degree"), col("max_degree"),
        // mean degree = 2m / n (NOT avg over edge rows, which would
        // weight each vertex by its own degree)
        round(col("se").cast("double") / col("n_vertices"), 6).as("avg_degree"),
        round(
          (col("se") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (col("se") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("assortativity"))
  }

  /** Per-community quality profile over an undirected graph and a
    * community assignment: size, internal and cut edge counts, volume
    * (Σ member degrees = 2·internal + cut), conductance
    * cut / min(vol, 2m − vol) and internal density
    * 2·internal / (size·(size−1)) — the report a GraphRAG layer runs
    * after community detection to decide which communities are worth
    * summarizing (dense, well-separated) vs artifacts (sparse, leaky).
    *
    * Labels must cover every edge endpoint (the [[graft.algo
    * .Modularity]] convention — detection outputs always do); vertices
    * carrying a label but no edge still profile with zero edges.
    *
    * Scale shape: two vertex-keyed label joins over the canonical pair
    * form (the modularity join shape), one explode to ≤ 2 rows per
    * edge, one map-side-combinable aggregation at community
    * granularity, and a broadcast of the 1-row global total. All
    * counts are exact BIGINTs; the two ratios are single fp divisions
    * of exact integers (cross-engine bit parity), rounded to 6dp.
    */
  def communityProfile(symEdges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirectedPairs(symEdges)
    val lab = labels.select(col("id"), col("community"))
    val tagged = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")),
        Seq("src"))
      .join(lab.select(col("id").as("dst"), col("community").as("cb")),
        Seq("dst"))
    // internal edges credit their community once; cut edges credit
    // both sides (so Σ cut counts each boundary edge twice globally)
    val contrib = tagged.select(explode(
      when(col("ca") === col("cb"), array(
        struct(col("ca").as("community"),
          lit(1L).as("internal"), lit(0L).as("cut"))))
        .otherwise(array(
          struct(col("ca").as("community"),
            lit(0L).as("internal"), lit(1L).as("cut")),
          struct(col("cb").as("community"),
            lit(0L).as("internal"), lit(1L).as("cut"))))).as("x"))
      .select(col("x.community").as("community"),
        col("x.internal").as("internal"), col("x.cut").as("cut"))
    val per = contrib.groupBy(col("community"))
      .agg(sum(col("internal")).as("internal_edges"),
        sum(col("cut")).as("cut_edges"))
    // 2m = Σ vol; null (empty edge set) coalesces to 0
    val tot = per.agg(coalesce(
      sum(col("internal_edges") * 2 + col("cut_edges")), lit(0L)).as("two_m"))
    val sizes = lab.groupBy(col("community")).agg(count(lit(1)).as("size"))

    sizes
      .join(per, Seq("community"), "left")
      .crossJoin(broadcast(tot))
      .select(col("community"), col("size"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        col("two_m"))
      .withColumn("volume", col("internal_edges") * 2 + col("cut_edges"))
      .withColumn("conductance", {
        val denom = least(col("volume"), col("two_m") - col("volume"))
        round(when(denom > 0,
          col("cut_edges").cast("double") / denom.cast("double"))
          .otherwise(lit(0.0)), 6)
      })
      .withColumn("internal_density",
        round(when(col("size") >= 2,
          (col("internal_edges") * 2).cast("double") /
            (col("size") * (col("size") - 1)).cast("double"))
          .otherwise(lit(0.0)), 6))
      .select(col("community"), col("size"), col("internal_edges"),
        col("cut_edges"), col("volume"), col("conductance"),
        col("internal_density"))
  }

  /** Co-occurrence graph construction from an event-shaped frame: two
    * actors are linked with weight = number of distinct buckets (time
    * windows, documents, sessions, …) they share — the standard
    * relational→graph step that turns an activity log into an edge
    * table the link-graph algorithms can run on.
    *
    * The per-bucket self-join is the quadratic surface, so buckets
    * larger than `maxBucket` are DROPPED, not expanded (the capped-LSH
    * discipline): a bucket of size s yields s·(s−1)/2 pairs, and one
    * hot bucket at 10⁶ actors would emit 5·10¹¹ rows — callers that
    * need hot-bucket signal should bucket finer instead. Recall
    * semantics: weights count only shared buckets of size ∈
    * [2, maxBucket]; singleton buckets carry no pair signal at all.
    *
    * Scale shape: one distinct (bucket, actor) aggregation, one
    * bucket-sized count + semi-join gate, one bucket-keyed self-join
    * bounded by maxBucket² per key, one (a, b) pair aggregation
    * (map-side combinable). Deterministic set algebra — the DuckDB
    * twin (`cooccurrence_sql`) replays it exactly.
    */
  def coOccurrenceEdges(df: DataFrame,
                        bucketCol: String,
                        actorCol: String,
                        maxBucket: Int = 1000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket must be >= 2, got $maxBucket")
    val ba = df.select(col(bucketCol).as("bucket"), col(actorCol).as("actor"))
      .filter(col("bucket").isNotNull && col("actor").isNotNull)
      .distinct()
    val keep = ba.groupBy(col("bucket")).agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2 && col("s") <= maxBucket)
      .select(col("bucket"))
    val gated = ba.join(keep.hint("shuffle_hash"), Seq("bucket"), "left_semi")
    gated.as("l")
      .join(gated.as("r"), col("l.bucket") === col("r.bucket")
        && col("l.actor") < col("r.actor"))
      .groupBy(col("l.actor").as("src"), col("r.actor").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Categorical (attribute) assortativity — Newman 2003 mixing: with
    * e_ij the fraction of directed edge ends from label i to label j
    * (both orientations of each undirected edge) and a_i = Σ_j e_ij,
    *
    *   r = (Σ e_ii − Σ a_i²) / (1 − Σ a_i²)
    *
    * computed from exact integers: same-label edge-end count, total
    * edge-end count M = 2m, and per-label volumes (Σ member degrees);
    * r = (same·M − Σ vol²) / (M² − Σ vol²) as ONE fp division of two
    * DECIMAL(38) values (vol² passes 2⁶³ at link-graph scale). The
    * "do entities of the same type actually link to each other"
    * diagnostic. Labels must cover every edge endpoint.
    *
    * Scale shape: the modularity join (two vertex-keyed label joins
    * over canonical pairs), one label-grain volume aggregation, two
    * 1-row aggregates. r = 1 for perfect mixing-by-label, 0 for
    * random, < 0 for disassortative; undefined (null) when every
    * endpoint shares one label.
    */
  def attributeAssortativity(symEdges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirectedPairs(symEdges)
    val lab = labels.select(col("id"), col("community"))
    val tagged = und
      .join(lab.select(col("id").as("src"), col("community").as("ca")), Seq("src"))
      .join(lab.select(col("id").as("dst"), col("community").as("cb")), Seq("dst"))
    val agg = tagged.agg(
      count(lit(1)).as("m"),
      sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("same"))
    // per-label volume = degree mass: each edge end credits its label
    val vol = tagged.select(col("ca").as("c")).unionAll(tagged.select(col("cb")))
      .groupBy(col("c")).agg(count(lit(1)).as("v"))
      .agg(sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
    // r = (4m·same − Σvol²) / (4m² − Σvol²); den = 0 ⟺ single label
    val num = (col("same").cast("decimal(38,0)") * 4 * col("m") - col("s2"))
      .cast("double")
    val den = (col("m").cast("decimal(38,0)") * 4 * col("m") - col("s2"))
      .cast("double")
    agg.crossJoin(vol).select(col("m"), col("same"),
      round(when(den =!= 0.0, num / den), 6).as("assortativity"))
  }

  /** Rich-club coefficient per degree level (Zhou–Mondragón 2004):
    * for each k in the graph's distinct degree values, N_k = vertices
    * with degree > k, E_k = edges with BOTH endpoint degrees > k, and
    * φ(k) = 2·E_k / (N_k·(N_k−1)) — do the hubs form their own dense
    * club? Exact integers plus one fp division per output row.
    *
    * Scale shape: one degree aggregation, one min-endpoint-degree edge
    * pass, then two HISTOGRAMS over distinct degree values (D =
    * O(√m) rows each) cross-compared — the quadratic piece is D²,
    * histogram-sized, never m. Output rows where N_k < 2 are dropped
    * (φ undefined).
    */
  def richClub(symEdges: DataFrame): DataFrame = {
    val und = undirectedPairs(symEdges)
    val deg = degrees(symEdges)
    val degHist = deg.groupBy(col("degree").as("d")).agg(count(lit(1)).as("cv"))
    val meHist = und
      .join(deg.select(col("id").as("src"), col("degree").as("du")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), Seq("dst"))
      .select(least(col("du"), col("dv")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("ce"))
    val ks = degHist.select(col("d").as("k"))
    val nk = ks.join(degHist, col("d") > col("k"), "left")
      .groupBy(col("k")).agg(coalesce(sum(col("cv")), lit(0L)).as("n_k"))
    val ek = ks.join(meHist, col("d") > col("k"), "left")
      .groupBy(col("k")).agg(coalesce(sum(col("ce")), lit(0L)).as("e_k"))
    nk.join(ek, Seq("k"))
      .filter(col("n_k") >= 2)
      .select(col("k"), col("n_k"), col("e_k"),
        round((col("e_k") * 2).cast("double") /
          (col("n_k") * (col("n_k") - 1)).cast("double"), 6).as("phi"))
  }

  /** Edge-level diff between two graph snapshots: each canonical
    * undirected pair is `kept`, `added` (only in `after`) or
    * `removed` (only in `before`) — the change-feed a link-graph
    * layer emits between ingestion runs (what did this commit batch
    * do to the dependency graph?). ONE full-outer join on the edge
    * key; both sides shuffle once on (src, dst).
    */
  def snapshotDiff(before: DataFrame, after: DataFrame): DataFrame = {
    val b = undirectedPairs(before).withColumn("in_b", lit(1))
    val a = undirectedPairs(after).withColumn("in_a", lit(1))
    b.join(a, Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"),
        when(col("in_b").isNotNull && col("in_a").isNotNull, lit("kept"))
          .when(col("in_a").isNotNull, lit("added"))
          .otherwise(lit("removed")).as("status"))
  }

  /** Per-vertex degree delta from a [[snapshotDiff]] frame: +1 per
    * incident added edge, −1 per removed, zero-delta vertices
    * dropped. One explode + one map-side-combinable aggregation.
    */
  def degreeDelta(diff: DataFrame): DataFrame =
    diff.filter(col("status") =!= "kept")
      .select(explode(array(col("src"), col("dst"))).as("id"),
        when(col("status") === "added", 1L).otherwise(-1L).as("d"))
      .groupBy(col("id")).agg(sum(col("d")).as("delta"))
      .filter(col("delta") =!= 0)

  /** Directed-graph reciprocity: the fraction of edges whose reverse
    * also exists (Wasserman–Faust), plus the raw counts — how mutual
    * the link graph is. One self-semi-join on the swapped key; the
    * final division is one fp op over exact integers.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val mutual = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(mutual.agg(count(lit(1)).as("n_mutual")))
      .select(col("n_edges"), col("n_mutual"),
        round(col("n_mutual").cast("double") / col("n_edges"), 6)
          .as("reciprocity"))
  }

  /** Bipartite co-occurrence projection: from a (left, right) incidence
    * table (document→entity, repo→contributor, …) to the weighted
    * right–right graph where weight = number of distinct shared lefts.
    * The GraphRAG shape: project the chunk→entity MENTIONS table onto
    * entities to get "co-mentioned in k chunks" edges.
    *
    * Scale shape: the projection is quadratic PER LEFT KEY (a left with
    * fanout f emits f·(f−1)/2 pairs), so unbounded hubs — boilerplate
    * documents mentioning thousands of entities — are the classic
    * blowup. Same defense as the capped LSH buckets
    * ([[graft.dedup.Dedup.cappedBucketPairs]]): fanouts via one
    * map-side-combinable groupBy, the >maxFanout keys (tiny by
    * construction — they are exactly the degenerate hubs the cap
    * exists for) broadcast back and anti-joined away, so the only wide
    * exchange is the small-key self-join + the final pair groupBy.
    * A co-occurrence edge whose only witnesses are dropped hubs is
    * lost — that is the documented recall trade (a "mentioned by the
    * same boilerplate page" edge carries no signal anyway). Dropped
    * hubs are observable via [[bipartiteFanoutStats]].
    *
    * Output: (u, v, weight) with u < v, both drawn from `rightCol`.
    */
  def bipartiteProject(pairs: DataFrame, leftCol: String, rightCol: String,
                       maxFanout: Int): DataFrame = {
    val p = pairs.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .filter(col("l").isNotNull && col("r").isNotNull)
      .distinct()
      .localCheckpoint(false) // feeds the fanout agg AND the self-join twice
    val hot = broadcast(
      p.groupBy(col("l")).agg(count(lit(1)).as("fan"))
        .filter(col("fan") > maxFanout)
        .select(col("l")))
    val ok = p.join(hot, Seq("l"), "left_anti")
    ok.as("x")
      .join(ok.as("y"),
        col("x.l") === col("y.l") && col("x.r") < col("y.r"))
      .select(col("x.r").as("u"), col("y.r").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("weight"))
  }

  /** Companion observability for [[bipartiteProject]]: fanout of every
    * left key over the cap — what the projection dropped and why.
    */
  def bipartiteFanoutStats(pairs: DataFrame, leftCol: String,
                           rightCol: String, maxFanout: Int): DataFrame =
    pairs.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .filter(col("l").isNotNull && col("r").isNotNull)
      .distinct()
      .groupBy(col("l")).agg(count(lit(1)).as("fan"))
      .filter(col("fan") > maxFanout)

  /** log₂-bucketed degree histogram of the undirected graph: bucket b
    * holds vertices with degree in [2^b, 2^(b+1)) — the standard
    * power-law eyeball. One degree agg + one tiny agg. The bucket is
    * the integer bit length − 1, computed EXACTLY via the binary
    * string (`floor(log2(x))` would be a cross-engine trap: Spark
    * evaluates log2 as ln/ln, which lands below the integer at exact
    * powers of two).
    */
  def degreeHistogram(symEdges: DataFrame): DataFrame =
    degrees(symEdges)
      .select((length(conv(col("degree"), 10, 2)) - 1).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vertices"))

  /** Disparity-filter backbone (Serrano, Boguñá & Vespignani, PNAS
    * 2009): the statistically-principled sparsifier for weighted
    * graphs — an edge survives if its weight is too large a share of
    * either endpoint's strength to be explained by uniformly-random
    * weight splitting. For endpoint i with degree k_i ≥ 2 and strength
    * s_i, the edge's p-value is α_ij = (1 − w_ij/s_i)^(k_i−1); the
    * edge is kept when α < `alpha` at EITHER endpoint (the standard
    * OR rule), and an edge both of whose endpoints have k < 2 is kept
    * (the test is undefined there — dropping it would delete the
    * component). On a co-occurrence graph ([[coOccurrenceEdges]],
    * [[bipartiteProjection]]) this prunes the dense low-signal weave
    * while keeping locally-dominant links, independent of any global
    * weight threshold.
    *
    * Scale shape: one edge-scale incidence explode → one map-side-
    * combinable (k, s) vertex aggregate → two vertex-keyed joins back
    * onto the edge table. No self-joins, no windows; survives any
    * skew because hot vertices only contribute one (k, s) row.
    * Returns every input edge with both p-values (null where k < 2)
    * and the keep flag; filter on `keep` for the backbone.
    *
    * @param pairs canonical undirected weighted edges (src < dst,
    *              weight), duplicate-free
    */
  def disparityBackbone(pairs: DataFrame, alpha: Double = 0.05): DataFrame = {
    val e = pairs.select(col("src"), col("dst"),
      col("weight").cast("double").as("w"))
    val inc = e.select(col("src").as("id"), col("w"))
      .unionAll(e.select(col("dst").as("id"), col("w")))
    val ks = inc.groupBy(col("id"))
      .agg(count(lit(1)).as("k"), sum(col("w")).as("s"))
    def aExpr(k: Column, s: Column): Column =
      when(k >= 2, pow(lit(1.0) - col("w") / s, k - lit(1L)))
    e.join(ks.select(col("id").as("src"), col("k").as("k_src"),
        col("s").as("s_src")), Seq("src"))
      .join(ks.select(col("id").as("dst"), col("k").as("k_dst"),
        col("s").as("s_dst")), Seq("dst"))
      .select(col("src"), col("dst"), col("w").as("weight"),
        aExpr(col("k_src"), col("s_src")).as("alpha_src"),
        aExpr(col("k_dst"), col("s_dst")).as("alpha_dst"))
      .withColumn("keep",
        (coalesce(col("alpha_src") < alpha, lit(false)) ||
          coalesce(col("alpha_dst") < alpha, lit(false)) ||
          (col("alpha_src").isNull && col("alpha_dst").isNull)))
  }

  /** Deterministic vertex keep-predicate for [[inducedSample]]: true
    * for ≈ num/den of all ids, engine-replayable (the [[graft.algo.Mis]]
    * double-quadratic scramble mod 2³¹−1 with the salt folded into the
    * second pass — every operand < 2⁶², exact in any 64-bit engine,
    * and non-monotone on the arithmetic-progression id patterns
    * structured graphs carry).
    */
  def sampleKeep(v: Column, num: Long, den: Long, salt: Long = 0L): Column = {
    require(num >= 0 && num <= den && den > 0, s"bad fraction $num/$den")
    val P = 2147483647L // 2^31 - 1
    val vp = pmod(v, lit(P))
    val q1 = pmod(vp * (vp + lit(3L)), lit(P))
    val q2 = pmod(q1 * (q1 + lit(7L) + lit(Math.floorMod(salt, P))), lit(P))
    pmod(q2, lit(den)) < num
  }

  /** Vertex-induced subgraph sample at fraction num/den: keep a
    * deterministic pseudo-random vertex subset, keep an edge iff BOTH
    * endpoints survive. The dev-loop primitive at 10^12 edges — debug
    * an algorithm on 1/10⁴ of the graph with the SAME code path, no
    * side table and no shuffle: the predicate is a codegen'd map-side
    * filter computed from the ids the scan already carries, and the
    * same (num, den, salt) reproduces the same subgraph on any cluster
    * size or partition layout.
    *
    * Statistical contract of vertex-induced sampling at rate p: edges
    * survive ≈ p², wedges ≈ p³ — fine for correctness/debug runs, NOT
    * an unbiased estimator of global counts (scale back up by the
    * appropriate power; triangles: p³).
    */
  def inducedSample(edges: DataFrame, num: Long, den: Long,
                    salt: Long = 0L): DataFrame =
    edges.filter(sampleKeep(col("src"), num, den, salt) &&
      sampleKeep(col("dst"), num, den, salt))
}

package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Driver-side oracles for the iterative algorithms: straightforward
  * single-node implementations used to cross-validate the distributed
  * ones on small graphs (SURVEY.md §5 "DF-vs-single-node-oracle").
  */
object Oracles {

  /** Standard PageRank with dangling-mass redistribution. */
  def pageRank(edges: Seq[(Long, Long)], damping: Double = 0.85,
               tol: Double = 1e-6, maxIter: Int = 200): Map[Long, Double] = {
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = verts.size
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val in = edges.groupBy(_._2)
    var ranks = verts.map(_ -> 1.0 / n).toMap
    var it = 0
    var delta = 1.0
    while (it < maxIter && delta >= tol) {
      val dangling = verts.filterNot(out.contains).map(ranks).sum
      val next = verts.map { v =>
        val contrib = in.getOrElse(v, Seq.empty).map { case (u, _) => ranks(u) / out(u) }.sum
        v -> ((1.0 - damping) / n + damping * (contrib + dangling / n))
      }.toMap
      delta = verts.map(v => math.abs(next(v) - ranks(v))).max
      ranks = next
      it += 1
    }
    ranks
  }

  /** Union-find connected components; label = min member id. */
  def components(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vertices.foreach(v => find(v))
    edges.foreach { case (a, b) => union(a, b) }
    vertices.map(v => v -> find(v)).toMap
  }

  /** Brute-force triangle count on an undirected graph. */
  def triangles(edges: Seq[(Long, Long)]): Long = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) = adj(a) + b; adj(b) = adj(b) + a }
    }
    val vs = adj.keys.toSeq.sorted
    var t = 0L
    for (u <- vs; v <- adj(u) if v > u; w <- adj(u) if w > v && adj(v).contains(w))
      t += 1
    t
  }
}

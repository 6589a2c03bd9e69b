package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, Partitioner}

/** Multilevel bisection invariants: balance, cut quality on a
  * locality graph, the obvious barbell split, and partitioning
  * determinism.
  */
class PartitionerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ring + short mixed-parity chords — connected, natural arc cuts. */
  def localityGraph(n: Long) = {
    val r = spark.range(n).select(col("id").as("a"))
    val ring = r.select(col("a").as("src"), pmod(col("a") + 1L, lit(n)).as("dst"))
    val chords = r.select(col("a").as("src"),
      pmod(col("a") + lit(5L) + pmod(col("a"), lit(4L)), lit(n)).as("dst"))
    GraphOps.undirectedPairs(
        ring.unionAll(chords).filter(col("src") =!= col("dst")).distinct())
      .withColumn("weight", lit(1L) + pmod(col("src") + col("dst"), lit(7L)))
  }

  test("bisect: balanced, and the cut is a sliver of the total weight") {
    val ew = localityGraph(600L).cache()
    val totalW = ew.agg(sum(col("weight"))).head().getLong(0)
    for (levels <- Seq(1, 3)) {
      val parts = Partitioner.bisect(spark, ew, levels, numPartitions = 4).cache()
      val sizes = parts.groupBy("part").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(0L, 1L))
      val n = sizes.values.sum
      assert(sizes.values.forall(_ >= n * 45 / 100),
        s"levels=$levels imbalance: $sizes")
      val cut = Partitioner.edgeCut(ew, parts)
      assert(cut * 20 <= totalW,
        s"levels=$levels cut $cut is not a sliver of $totalW")
      parts.unpersist()
    }
    ew.unpersist()
  }

  test("bisect finds the barbell bridge") {
    // two K6 cliques joined by one light bridge: the only balanced
    // low-cut split severs the bridge
    val clique = for {
      b <- Seq(0L, 100L); i <- 0L until 6L; j <- (i + 1) until 6L
    } yield (b + i, b + j, 10L)
    val ew = (clique :+ ((5L, 100L, 1L))).toDF("src", "dst", "weight")
    val parts = Partitioner.bisect(spark, ew, levels = 2, numPartitions = 2)
    val byPart = parts.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sideOf0 = byPart.filter(_._1 < 100L).values.toSet
    val sideOf100 = byPart.filter(_._1 >= 100L).values.toSet
    assert(sideOf0.size == 1 && sideOf100.size == 1 && sideOf0 != sideOf100,
      s"cliques must land whole on opposite sides: $byPart")
    assert(Partitioner.edgeCut(ew, parts) == 1L)
  }

  test("refine: cut never increases, improves the fixture, reaches a fixed point") {
    val ew = localityGraph(500L).cache()
    val p0 = Partitioner.bisect(spark, ew, levels = 2, numPartitions = 4)
      .localCheckpoint(true)
    val cut0 = Partitioner.edgeCut(ew, p0)
    val r1 = Partitioner.refine(spark, ew, p0, numPartitions = 4)
      .localCheckpoint(true)
    val cut1 = Partitioner.edgeCut(ew, r1)
    assert(cut1 <= cut0, s"refinement worsened the cut: $cut0 -> $cut1")
    assert(cut1 < cut0, s"refinement should improve the fixture bisection")
    // idempotence at the fixed point
    val r2 = Partitioner.refine(spark, ew, r1, numPartitions = 4)
    assert(Partitioner.edgeCut(ew, r2) == cut1)
    val same = r1.withColumnRenamed("part", "p1")
      .join(r2.withColumnRenamed("part", "p2"), Seq("id"))
      .filter(col("p1") =!= col("p2")).count()
    assert(same == 0, "a second refine pass must be a no-op")
    // balance drift stays small
    val sizes = r1.groupBy("part").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    assert(sizes.values.forall(_ >= n * 45 / 100), s"refine drifted: $sizes")
    ew.unpersist()
  }

  test("refine keeps moving until positive-gain movers are exhausted") {
    import spark.implicits._
    // adversarial start: id-parity split of the locality graph — a
    // near-worst cut the refiner must walk a long way down from
    val ew = localityGraph(300L).cache()
    val bad = ew.select(col("src").as("id"))
      .unionAll(ew.select(col("dst").as("id"))).distinct()
      .withColumn("part", pmod(col("id"), lit(2L)))
    val cutBad = Partitioner.edgeCut(ew, bad)
    val r = Partitioner.refine(spark, ew, bad, maxRounds = 50, numPartitions = 4)
    val cutR = Partitioner.edgeCut(ew, r)
    assert(cutR < cutBad / 2,
      s"refiner barely moved: $cutBad -> $cutR")
    ew.unpersist()
  }

  test("k-way: covers every vertex once, balanced, cut a sliver, k respected") {
    val ew = localityGraph(600L).cache()
    val totalW = ew.agg(sum(col("weight"))).head().getLong(0)
    val nVerts = ew.select(col("src").as("id"))
      .unionAll(ew.select(col("dst").as("id"))).distinct().count()
    for (k <- Seq(2, 4, 8)) {
      val parts = Partitioner.partition(spark, ew, k, levels = 1,
        numPartitions = 4).cache()
      // exactly one label per vertex, labels within [0, k)
      assert(parts.count() == nVerts, s"k=$k must cover every vertex once")
      assert(parts.select(countDistinct(col("id"))).head().getLong(0) == nVerts)
      val labels = parts.select(col("part")).distinct().collect()
        .map(_.getLong(0)).toSet
      assert(labels.forall(p => p >= 0 && p < k), s"k=$k labels: $labels")
      assert(labels.size == k, s"k=$k must use all $k labels: $labels")
      // balance: every side within ±25% of n/k on the locality fixture
      val sizes = parts.groupBy("part").count().collect().map(_.getLong(1))
      assert(sizes.forall(s => s * 4 >= nVerts / k * 3),
        s"k=$k imbalance: ${sizes.toSeq}")
      // cut stays a sliver of the total weight (k−1 nested bisections)
      val cut = Partitioner.edgeCut(ew, parts)
      assert(cut * 10 <= totalW, s"k=$k cut $cut of $totalW")
      parts.unpersist()
    }
    ew.unpersist()
  }

  test("k-way k=2 equals bisect+refine") {
    val ew = localityGraph(400L)
    val two = Partitioner.partition(spark, ew, 2, levels = 1, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val direct = Partitioner.refine(spark, ew,
        Partitioner.bisect(spark, ew, levels = 1, numPartitions = 4),
        numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(two == direct)
  }

  test("bisect is deterministic across partition counts") {
    val ew = localityGraph(400L)
    def p(np: Int) = Partitioner.bisect(spark, ew, levels = 2, numPartitions = np)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(p(2) == p(5))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{GraphOps, NeighborSampling}

/** Structural invariants of the deterministic GraphSAGE sampler:
  * fan-out bounds, edge validity, frontier chaining, low-degree
  * completeness, and bit-identical reruns.
  */
class NeighborSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture: DataFrame = {
    val n = 200L
    val base = spark.range(n).select(col("id").as("a"))
    def rule(m: Long, c: Long) =
      base.select(col("a").as("src"),
        pmod(col("a") * 5 + lit(3L) * (pmod(col("a"), lit(m)) + c), lit(n)).as("dst"))
    GraphOps.symmetrize(rule(7, 1).unionAll(rule(11, 4))
      .filter(col("src") =!= col("dst")).distinct())
  }

  test("fanout bounds, edge validity, frontier chaining, determinism") {
    val sym = fixture.cache()
    val seeds = sym.select(col("src").as("id")).distinct()
      .filter(pmod(col("id"), lit(10L)) === 0)
    val out = NeighborSampling.sample(spark, sym, seeds, Seq(3, 2),
      numPartitions = 4).cache()

    // per-vertex fanout respected per layer
    val over = out.groupBy(col("layer"), col("src")).agg(count(lit(1)).as("c"))
      .filter((col("layer") === 1 && col("c") > 3) ||
        (col("layer") === 2 && col("c") > 2)).count()
    assert(over == 0)

    // every sampled row is a real edge
    assert(out.select(col("src"), col("dst"))
      .join(sym, Seq("src", "dst"), "left_anti").count() == 0)

    // layer-2 sources are exactly drawn from layer-1 sampled targets
    val l2src = out.filter(col("layer") === 2).select(col("src").as("id")).distinct()
    val l1dst = out.filter(col("layer") === 1).select(col("dst").as("id")).distinct()
    assert(l2src.join(l1dst, Seq("id"), "left_anti").count() == 0)

    // a vertex with degree <= fanout keeps ALL its neighbors
    val degs = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val small = seeds.withColumnRenamed("id", "src")
      .join(degs, Seq("src")).filter(col("d") <= 3)
    val kept = out.filter(col("layer") === 1)
      .groupBy(col("src")).agg(count(lit(1)).as("k"))
    val incomplete = small.join(kept, Seq("src"), "left")
      .filter(coalesce(col("k"), lit(0L)) =!= col("d")).count()
    assert(incomplete == 0)

    // bit-identical rerun
    val again = NeighborSampling.sample(spark, sym, seeds, Seq(3, 2),
      numPartitions = 4)
    assert(out.unionAll(again).distinct().count() == out.distinct().count()
      && out.count() == again.count())

    out.unpersist(); sym.unpersist()
  }

  test("negative samples: verified non-edges, capped, deterministic") {
    val sym = fixture.cache()
    val seeds = sym.select(col("src").as("id")).distinct()
      .filter(pmod(col("id"), lit(10L)) === 0)
    val neg = NeighborSampling.negativeSample(spark, sym, seeds, k = 4,
      numPartitions = 4).cache()

    // never a real edge, never a self-loop, always a known vertex
    assert(neg.join(sym, Seq("src", "dst"), "left_semi").count() == 0)
    assert(neg.filter(col("src") === col("dst")).count() == 0)
    val verts = sym.select(col("src").as("dst")).distinct()
    assert(neg.join(verts, Seq("dst"), "left_anti").count() == 0)

    // at most k per seed, and only for seeds
    val per = neg.groupBy(col("src")).agg(count(lit(1)).as("c"))
    assert(per.filter(col("c") > 4).count() == 0)
    assert(neg.select(col("src").as("id")).distinct()
      .join(seeds, Seq("id"), "left_anti").count() == 0)

    // bit-identical rerun
    val again = NeighborSampling.negativeSample(spark, sym, seeds, k = 4,
      numPartitions = 4)
    assert(neg.count() == again.count()
      && neg.unionAll(again).distinct().count() == neg.count())

    neg.unpersist(); sym.unpersist()
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.ShortestPaths

/** Temporal fastest-duration reachability: Pareto (departure, arrival)
  * label correcting.
  */
class FastestPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def te(rows: (Long, Long, Long)*): DataFrame = rows.toDF("src", "dst", "ts")

  def seeds(ids: Long*): DataFrame = ids.toDF("id")

  def durs(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("departing later beats the earliest-arrival path") {
    // 1→2@2, 2→3@9 (EA path: depart 2 arrive 9, duration 7)
    // 1→2@8, 2→3@9 (fastest: depart 8 arrive 9, duration 1)
    val es = te((1L, 2L, 2L), (1L, 2L, 8L), (2L, 3L, 9L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 4))
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("seed duration is 0 even when unreachable otherwise") {
    val es = te((1L, 2L, 5L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(9L),
      startTime = 0L, numPartitions = 2))
    assert(got == Map(9L -> 0L))
  }

  test("time-travel forbidden: decreasing timestamps block the path") {
    // 1→2@5 then 2→3@3 is not time-respecting
    val es = te((1L, 2L, 5L), (2L, 3L, 3L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 2))
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("startTime gate: departures before it are forbidden") {
    val es = te((1L, 2L, 3L), (1L, 2L, 7L), (2L, 3L, 8L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 5L, numPartitions = 2))
    // only the @7 departure is legal: 2 at duration 0, 3 via 7→8
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("waiting at an intermediate vertex is allowed") {
    // 1→2@1 then wait, 2→3@10: duration 9 — no faster route exists
    val es = te((1L, 2L, 1L), (2L, 3L, 10L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 2))
    assert(got(3L) == 9L)
  }

  test("multi-seed: min duration across sources") {
    // to 3: from 1 via (1,3)@9 departing 9 → 0-hop? no: duration a−d = 0
    // is impossible for a 1-edge path? d = a = 9 → duration 0. Use two
    // hops from 1 vs one hop from 2 with a genuine wait.
    val es = te((1L, 4L, 1L), (4L, 3L, 6L), (2L, 3L, 7L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L, 2L),
      startTime = 0L, numPartitions = 4))
    // from 1: depart 1 arrive 6 → 5; from 2: depart 7 arrive 7 → 0
    assert(got(3L) == 0L)
    assert(got(4L) == 0L)
  }

  test("Pareto frontier carries both a fast-late and slow-early label") {
    // to 4 the only continuation is 3→4@6, needing arrival ≤ 6 at 3:
    // label (d=1, a=2) reaches it (duration 5); the faster (d=5, a=5)
    // label at 3 via the @5 edge would give duration 1 BUT cannot be
    // extended... make it extendable to show the non-greedy pick
    val es = te((1L, 3L, 2L), (1L, 3L, 5L), (3L, 4L, 6L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 4))
    // at 3: labels (2,2) and (5,5); both extend via @6 → (2,6)=4, (5,6)=1
    assert(got(3L) == 0L)
    assert(got(4L) == 1L)
  }

  test("dominated label is pruned without changing results") {
    // (d=2,a=9) at 2 is dominated by (d=2,a=3) — same departures, the
    // earlier arrival extends strictly more edges
    val es = te((1L, 2L, 3L), (1L, 5L, 2L), (5L, 2L, 9L), (2L, 3L, 4L))
    val got = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 4))
    assert(got(3L) == 1L) // depart 3, arrive 4
  }

  test("partitioning-invariant: 2 vs 8 partitions") {
    val es = te((1L, 2L, 2L), (1L, 2L, 8L), (2L, 3L, 9L), (3L, 4L, 12L),
      (1L, 4L, 3L), (4L, 5L, 15L), (2L, 5L, 11L))
    val a = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 2))
    val b = durs(ShortestPaths.fastestDuration(spark, es, seeds(1L),
      startTime = 0L, numPartitions = 8))
    assert(a == b)
  }
}

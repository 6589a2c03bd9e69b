package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.ShortestPaths
import graft.graph.GraphOps

/** Temporal earliest-arrival reachability: paths must have
  * non-decreasing timestamps, arrival at dst = the edge's ts.
  */
class TemporalReachSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tEdges(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("src", "dst", "ts")

  def seeds(ids: Long*): DataFrame = ids.toDF("id")

  def arrivals(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("time travel is forbidden: a later edge cannot feed an earlier one") {
    // 1 -(t5)-> 2 -(t3)-> 3: 3 unreachable (3 < 5); 2 -(t7)-> 4 fine
    val e = tEdges((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L))
    val a = arrivals(ShortestPaths.earliestArrival(
      spark, e, seeds(1L), startTime = 0L, numPartitions = 4))
    assert(a == Map(1L -> 0L, 2L -> 5L, 4L -> 7L))
  }

  test("label correcting: a later-found earlier arrival re-opens downstream edges") {
    // direct 1->2 at t10; detour 1->3 (t1) -> 2 (t2) improves 2 to t2,
    // which is what makes 2->5 (t4) usable at all
    val e = tEdges((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L), (2L, 5L, 4L))
    val a = arrivals(ShortestPaths.earliestArrival(
      spark, e, seeds(1L), startTime = 0L, numPartitions = 4))
    assert(a == Map(1L -> 0L, 3L -> 1L, 2L -> 2L, 5L -> 4L))
  }

  test("startTime gates the first hop") {
    val e = tEdges((1L, 2L, 1L), (1L, 4L, 3L))
    val a = arrivals(ShortestPaths.earliestArrival(
      spark, e, seeds(1L), startTime = 3L, numPartitions = 4))
    assert(a == Map(1L -> 3L, 4L -> 3L)) // 2 unreachable: its edge pre-dates the seed
  }

  test("multi-seed min and unreachable absence") {
    // two seeds race for 3; disconnected 9->10 never appears
    val e = tEdges((1L, 3L, 8L), (2L, 3L, 4L), (9L, 10L, 1L))
    val a = arrivals(ShortestPaths.earliestArrival(
      spark, e, seeds(1L, 2L), startTime = 0L, numPartitions = 4))
    assert(a == Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }

  test("constant timestamps reduce to static reachability") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
    val e = tEdges(pairs.map { case (u, v) => (u, v, 5L) }: _*)
    val a = arrivals(ShortestPaths.earliestArrival(
      spark, e, seeds(1L), startTime = 0L, numPartitions = 4))
    // every vertex BFS-reachable from 1 arrives (at t5), nothing else
    assert(a.keySet == Set(1L, 2L, 3L, 4L))
    assert(a(2L) == 5L && a(4L) == 5L)
  }

  // ─────────────── latest departure (the mirror) ───────────────

  test("latest departure: a descending-ts chain blocks the early hop") {
    // 1 -(t5)-> 2 -(t3)-> 3: leaving 1 arrives at 2 at t5, after 2's
    // own latest departure (t3) — so 1 cannot reach 3 at all
    val e = tEdges((1L, 2L, 5L), (2L, 3L, 3L))
    val d = arrivals(ShortestPaths.latestDeparture(
      spark, e, seeds(3L), deadline = 10L, numPartitions = 4))
    assert(d == Map(3L -> 10L, 2L -> 3L))
  }

  test("latest departure: feasible chain and max-merge over two routes") {
    val chain = arrivals(ShortestPaths.latestDeparture(
      spark, tEdges((1L, 2L, 2L), (2L, 3L, 4L)), seeds(3L),
      deadline = 10L, numPartitions = 4))
    assert(chain == Map(3L -> 10L, 2L -> 4L, 1L -> 2L))

    // direct (t9) beats the via-2 route (t5): max-merge keeps 9
    val two = arrivals(ShortestPaths.latestDeparture(
      spark, tEdges((1L, 3L, 9L), (1L, 2L, 5L), (2L, 3L, 6L)), seeds(3L),
      deadline = 10L, numPartitions = 4))
    assert(two == Map(3L -> 10L, 2L -> 6L, 1L -> 9L))
  }

  test("latest departure: the deadline gates late edges") {
    val e = tEdges((1L, 3L, 8L), (2L, 3L, 12L))
    val d = arrivals(ShortestPaths.latestDeparture(
      spark, e, seeds(3L), deadline = 10L, numPartitions = 4))
    assert(d == Map(3L -> 10L, 1L -> 8L)) // 2's only edge lands at t12 > deadline
  }
}

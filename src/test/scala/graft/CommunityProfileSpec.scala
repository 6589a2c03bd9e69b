package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps

/** Community profile on the two-triangles-with-a-bridge fixture with a
  * hand-assigned partition: every count, volume, conductance and
  * density value computed by hand; an edge-free labeled vertex profiles
  * with zeros.
  */
class CommunityProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed profile: counts, conductance, density, edge-free community") {
    // triangles {1,2,3} and {5,6,7}, bridge 3-4-5, pendant 8 off 1
    val sym = GraphOps.symmetrize(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (5L, 6L), (5L, 7L), (6L, 7L), (3L, 4L), (4L, 5L), (1L, 8L))
      .toDF("src", "dst"))
    // {1,2,3,4} -> 100, {5,6,7,8} -> 200, edge-free vertex 9 -> 300
    val labels = Seq(1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 100L,
      5L -> 200L, 6L -> 200L, 7L -> 200L, 8L -> 200L, 9L -> 300L)
      .toDF("id", "community")

    val got = GraphOps.communityProfile(sym, labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap

    // m = 9, 2m = 18
    // 100: internal (1,2)(1,3)(2,3)(3,4)=4, cut (4,5)(1,8)=2, vol 10,
    //      conductance 2/min(10,8)=0.25, density 8/(4*3)=0.666667
    assert(got(100L) == ((4L, 4L, 2L, 10L, 0.25, 0.666667)))
    // 200: internal (5,6)(5,7)(6,7)=3, cut 2, vol 8,
    //      conductance 2/min(8,10)=0.25, density 6/12=0.5
    assert(got(200L) == ((4L, 3L, 2L, 8L, 0.25, 0.5)))
    // 300: no edges at all
    assert(got(300L) == ((1L, 0L, 0L, 0L, 0.0, 0.0)))
  }

  test("attribute assortativity: two labeled triangles with one cross edge") {
    // m = 7, same = 6, vols 7/7 → r = (4·7·6 − 98)/(4·49 − 98) = 70/98
    val sym = GraphOps.symmetrize(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst"))
    val labels = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 4L).toDF("id", "community")
    val r = GraphOps.attributeAssortativity(sym, labels).collect()(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == math.rint(70.0 / 98.0 * 1e6) / 1e6)
  }

  test("rich club: K4 with two pendants, per-level club density") {
    val sym = GraphOps.symmetrize(Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (4L, 9L), (3L, 10L)).toDF("src", "dst"))
    val got = GraphOps.richClub(sym).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // k=1: the K4 (4 vertices, 6 edges, φ=1); k=3: {3,4} with their
    // edge (φ=1); k=4 dropped (no vertices above), singletons dropped
    assert(got == Map(1L -> ((4L, 6L, 1.0)), 3L -> ((2L, 1L, 1.0))))
  }

  test("co-occurrence edges: shared-bucket weights, hot bucket dropped") {
    // b1 {1,2,3}, b2 {1,2}, b3 {1..5} over the cap, b4 {7} singleton
    val ev = Seq(
      ("b1", 1L), ("b1", 2L), ("b1", 3L), ("b1", 3L), // dup row collapses
      ("b2", 1L), ("b2", 2L),
      ("b3", 1L), ("b3", 2L), ("b3", 3L), ("b3", 4L), ("b3", 5L),
      ("b4", 7L)).toDF("bucket", "actor")
    val got = GraphOps.coOccurrenceEdges(ev, "bucket", "actor", maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("snapshot diff + degree delta: added/kept/removed, orientation-proof") {
    val before = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val after = Seq((3L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst") // (3,2) flipped
    val diff = GraphOps.snapshotDiff(before, after)
    val got = diff.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got == Map((1L, 2L) -> "removed", (2L, 3L) -> "kept",
      (3L, 4L) -> "kept", (4L, 5L) -> "added"))
    val delta = GraphOps.degreeDelta(diff).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 nets to zero and is dropped
    assert(delta == Map(1L -> -1L, 2L -> -1L, 4L -> 1L, 5L -> 1L))
  }

  test("adjusted Rand index: hand-computed, relabel-invariant, degenerate") {
    import graft.algo.PartitionCompare
    def part(m: (Long, Long)*) = m.toSeq.toDF("id", "community")
    // P1 = {1,2,3},{4,5,6}; P2 = {1,2},{3,4,5,6}:
    // ARI = 2(30*8 - 12*14)/(30*26 - 2*12*14) = 144/444
    val p1 = part(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
    val p2 = part(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 3L)
    val r = PartitionCompare.ari(p1, p2).collect()(0)
    assert(r.getLong(0) == 6L && r.getLong(1) == 4L
      && r.getLong(2) == 6L && r.getLong(3) == 7L)
    assert(r.getDouble(4) == math.rint(144.0 / 444.0 * 1e6) / 1e6)
    // same clustering under different label names -> 1
    val p2r = part(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 7L, 5L -> 7L, 6L -> 7L)
    assert(PartitionCompare.ari(p1, p2r).collect()(0).getDouble(4) == 1.0)
    // degenerate: both one cluster -> denominator 0, perfect -> 1
    val all1 = part((1L to 6L).map(_ -> 1L): _*)
    val all2 = part((1L to 6L).map(_ -> 2L): _*)
    assert(PartitionCompare.ari(all1, all2).collect()(0).getDouble(4) == 1.0)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.BowTie

/** Broder bow-tie decomposition: CORE / IN / OUT / TUBE / TENDRIL_IN /
  * TENDRIL_OUT / OTHER / DISCONNECTED, validated against a handcrafted
  * graph exercising every region and a brute-force closure oracle on
  * seeded random digraphs.
  */
class BowTieSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(rows: (Long, Long)*): DataFrame = rows.toDF("src", "dst")

  def regions(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Brute-force oracle: transitive closure by repeated squaring over
    * a set, then the exact region definitions.
    */
  def oracle(es: Seq[(Long, Long)]): Map[Long, String] = {
    val verts = (es.map(_._1) ++ es.map(_._2)).distinct
    var closure = es.filter(e => e._1 != e._2).toSet
    var grown = true
    while (grown) {
      val next = closure ++ (for {
        (a, b) <- closure; (c, d) <- closure if b == c
      } yield (a, d))
      grown = next.size != closure.size
      closure = next
    }
    def reaches(a: Long, b: Long) = a == b || closure.contains((a, b))
    // SCC label = min mutually-reachable vertex
    val scc = verts.map(v => v -> verts.filter(u => reaches(u, v) && reaches(v, u)).min).toMap
    val coreLabel = scc.groupBy(_._2).toSeq
      .sortBy { case (label, members) => (-members.size, label) }.head._1
    val core = verts.filter(v => scc(v) == coreLabel).toSet
    val inS = verts.filter(v => !core(v) && core.exists(c => reaches(v, c))).toSet
    val outS = verts.filter(v => !core(v) && core.exists(c => reaches(c, v))).toSet
    val rest = verts.filterNot(v => core(v) || inS(v) || outS(v)).toSet
    val fwdIn = rest.filter(v => inS.exists(u => reaches(u, v)))
    val bwdOut = rest.filter(v => outS.exists(u => reaches(v, u)))
    // weak components over the symmetrized closure
    val sym = es.flatMap(e => Seq(e, (e._2, e._1)))
    var wcc = verts.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- sym) {
        val m = math.min(wcc(a), wcc(b))
        if (wcc(a) != m) { wcc += (a -> m); changed = true }
        if (wcc(b) != m) { wcc += (b -> m); changed = true }
      }
    }
    val coreWcc = wcc(coreLabel)
    verts.map { v =>
      v -> (if (core(v)) "CORE"
      else if (inS(v)) "IN"
      else if (outS(v)) "OUT"
      else if (fwdIn(v) && bwdOut(v)) "TUBE"
      else if (fwdIn(v)) "TENDRIL_IN"
      else if (bwdOut(v)) "TENDRIL_OUT"
      else if (wcc(v) == coreWcc) "OTHER"
      else "DISCONNECTED")
    }.toMap
  }

  test("every region appears and is classified exactly") {
    val es = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // core cycle {1,2,3}
      (11L, 10L), (10L, 1L), // IN chain
      (3L, 20L), (20L, 21L), // OUT chain
      (10L, 30L), (30L, 20L), // TUBE: IN → 30 → OUT
      (11L, 40L), // TENDRIL_IN: sink off IN
      (50L, 21L), // TENDRIL_OUT: nothing reaches 50
      (60L, 40L), // OTHER: feeds a tendril, no IN/OUT relation
      (70L, 71L), (71L, 70L)) // DISCONNECTED 2-cycle (< core size)
    val got = regions(BowTie.decompose(spark, edges(es: _*), numPartitions = 4))
    val want = Map(
      1L -> "CORE", 2L -> "CORE", 3L -> "CORE",
      10L -> "IN", 11L -> "IN",
      20L -> "OUT", 21L -> "OUT",
      30L -> "TUBE", 40L -> "TENDRIL_IN", 50L -> "TENDRIL_OUT",
      60L -> "OTHER", 70L -> "DISCONNECTED", 71L -> "DISCONNECTED")
    assert(got == want)
    assert(got == oracle(es))
  }

  test("fully strongly connected graph is all CORE") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = regions(BowTie.decompose(spark, edges(es: _*), numPartitions = 4))
    assert(got.values.toSet == Set("CORE"))
  }

  test("pure DAG: singleton core, everything placed relative to it") {
    // chain 1 → 2 → 3: every SCC is a singleton; the tie-break picks
    // label 1, so 2 and 3 land in OUT
    val got = regions(BowTie.decompose(
      spark, edges((1L, 2L), (2L, 3L)), numPartitions = 4))
    assert(got == Map(1L -> "CORE", 2L -> "OUT", 3L -> "OUT"))
    assert(got == oracle(Seq((1L, 2L), (2L, 3L))))
  }

  test("matches the brute-force oracle on seeded random digraphs") {
    val rnd = new scala.util.Random(20260819L)
    for (trial <- 1 to 4) {
      val n = 24 + trial * 4
      val es = (1 to n * 2).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).distinct
      val got = regions(BowTie.decompose(spark, edges(es: _*), numPartitions = 4))
      assert(got == oracle(es), s"trial $trial (n=$n) diverged")
    }
  }

  test("summary partitions the vertex set") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 1L), (3L, 20L), (70L, 71L))
    val dec = BowTie.decompose(spark, edges(es: _*), numPartitions = 4)
    val total = BowTie.summary(dec).agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0)
    assert(total == 7L) // 1,2,3,10,20,70,71 — and nothing else
  }
}

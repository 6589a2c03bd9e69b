package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.TriadCensus

/** Holland–Leinhardt 16-type triad census vs a literal classification
  * of every vertex triple (the engine never enumerates triples; the
  * brute force here does exactly that).
  */
class TriadCensusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def census(edges: Seq[(Long, Long)], n: Long): Map[String, BigInt] = {
    val df = edges.toDF("src", "dst")
    val verts = spark.range(n).toDF("id")
    TriadCensus.run(spark, df, Some(verts), numPartitions = 4)
      .collect()
      .map(r => r.getString(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
  }

  /** Literal 16-type classification of one triple. */
  def classify(es: Set[(Long, Long)], a: Long, b: Long, c: Long): String = {
    def arrow(x: Long, y: Long) = es.contains((x, y))
    def code(x: Long, y: Long) =
      (if (arrow(x, y)) 1 else 0) + (if (arrow(y, x)) 2 else 0)
    val dy = Seq(code(a, b), code(a, c), code(b, c))
    val conn = dy.count(_ > 0)
    val nm = dy.count(_ == 3)
    def wedge(center: Long, p: Long, q: Long): String = {
      val (cp, cq) = (code(center, p), code(center, q))
      if (cp == 3 && cq == 3) "201"
      else if (cp == 3 || cq == 3) {
        val asym = if (cp == 3) cq else cp
        if ((asym & 1) != 0) "111U" else "111D"
      } else if ((cp & 1) != 0 && (cq & 1) != 0) "021D"
      else if ((cp & 2) != 0 && (cq & 2) != 0) "021U"
      else "021C"
    }
    conn match {
      case 0 => "003"
      case 1 => if (nm == 1) "102" else "012"
      case 2 =>
        if (dy(0) > 0 && dy(1) > 0) wedge(a, b, c)
        else if (dy(0) > 0 && dy(2) > 0) wedge(b, a, c)
        else wedge(c, a, b)
      case _ =>
        nm match {
          case 3 => "300"
          case 2 => "210"
          case 1 =>
            val (x, y, z) =
              if (dy(0) == 3) (a, b, c)
              else if (dy(1) == 3) (a, c, b)
              else (b, c, a)
            if (arrow(z, x) && arrow(z, y)) "120D"
            else if (arrow(x, z) && arrow(y, z)) "120U"
            else "120C"
          case _ =>
            val cyc = (arrow(a, b) && arrow(b, c) && arrow(c, a)) ||
              (arrow(a, c) && arrow(c, b) && arrow(b, a))
            if (cyc) "030C" else "030T"
        }
    }
  }

  def brute(edges: Seq[(Long, Long)], n: Long): Map[String, BigInt] = {
    val es = edges.filter(e => e._1 != e._2).toSet
    val counts = scala.collection.mutable.Map[String, BigInt]()
      .withDefaultValue(BigInt(0))
    for (a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n)
      counts(classify(es, a, b, c)) += 1
    TriadCensus.AllTypes.map(t => t -> counts(t)).toMap
  }

  test("hand triads: each closed type classified exactly") {
    // n=3 single-triad graphs
    assert(census(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 3)("030T") == 1)
    assert(census(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 3)("030C") == 1)
    assert(census(Seq((0L, 1L), (1L, 0L), (2L, 0L), (2L, 1L)), 3)("120D") == 1)
    assert(census(Seq((0L, 1L), (1L, 0L), (0L, 2L), (1L, 2L)), 3)("120U") == 1)
    assert(census(Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 1L)), 3)("120C") == 1)
    assert(census(
      Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 2L)), 3)("210") == 1)
    assert(census(
      Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (1L, 2L), (2L, 1L)),
      3)("300") == 1)
  }

  test("hand triads: wedge and dyad types") {
    assert(census(Seq((1L, 0L), (1L, 2L)), 3)("021D") == 1) // diverge from 1
    assert(census(Seq((0L, 1L), (2L, 1L)), 3)("021U") == 1) // converge into 1
    assert(census(Seq((0L, 1L), (1L, 2L)), 3)("021C") == 1) // path
    assert(census(Seq((0L, 1L), (1L, 0L), (2L, 1L)), 3)("111D") == 1)
    assert(census(Seq((0L, 1L), (1L, 0L), (1L, 2L)), 3)("111U") == 1)
    assert(census(Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L)), 3)("201") == 1)
    val d = census(Seq((0L, 1L)), 4) // one asym dyad, two isolates
    assert(d("012") == 2 && d("003") == 2)
    val m = census(Seq((0L, 1L), (1L, 0L)), 4)
    assert(m("102") == 2 && m("003") == 2)
  }

  test("seeded deterministic digraphs match literal enumeration") {
    for (seed <- Seq(3L, 11L)) {
      val n = 13L
      // congruential scatter with some reciprocation
      val edges = (0L until 60L).map { k =>
        val s = (k * k * seed + 5 * k + seed) % n
        val d = (k * seed + 3 * k * k + 1) % n
        (s, d)
      } ++ (0L until 12L).map { k =>
        val s = (k * seed + 2) % n
        val d = (k + seed) % n
        (d, s) // deliberate reversals → mutual dyads
      }
      val got = census(edges, n)
      val want = brute(edges, n)
      assert(got == want, s"seed=$seed\n got=$got\nwant=$want")
      assert(got.values.sum == BigInt(n * (n - 1) * (n - 2) / 6))
    }
  }

  test("vertex universe extends 003/012/102 only") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 3L))
    val small = census(edges, 5)
    val large = census(edges, 8)
    for (t <- TriadCensus.AllTypes
         if t != "003" && t != "012" && t != "102")
      assert(small(t) == large(t), t)
    assert(large == brute(edges, 8))
  }

  test("isolated-free default universe matches explicit one") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
    val df = edges.toDF("src", "dst")
    val a = TriadCensus.run(spark, df, None, numPartitions = 2)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val b = TriadCensus.run(spark, df,
      Some(spark.range(4).toDF("id")), numPartitions = 2)
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(a == b)
  }
}

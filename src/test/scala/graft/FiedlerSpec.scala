package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Fiedler
import graft.graph.GraphOps

/** Deflated power iteration to the Fiedler vector / λ₂. */
class FiedlerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edges(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  test("P3: Fiedler vector (a, 0, -a), lambda2 converges to 1") {
    val r = Fiedler.run(spark,
      GraphOps.symmetrize(edges((1L, 2L), (2L, 3L))),
      numPartitions = 2, iters = 60)
    val f = r.vector.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // path Laplacian eigenvalues 0, 1, 3; Fiedler = (1, 0, -1)/√2
    assert(math.abs(r.lambda2 - 1.0) < 1e-9, s"lambda2=${r.lambda2}")
    assert(math.abs(f(2L)) < 1e-9)
    assert(math.abs(math.abs(f(1L)) - 1.0 / math.sqrt(2)) < 1e-9)
    assert(f(1L) == -f(3L))
  }

  test("barbell: sign structure is the spectral bisection, small lambda2") {
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = Seq((5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (6L, 8L), (7L, 8L))
    val r = Fiedler.run(spark,
      GraphOps.symmetrize(edges((k4a ++ k4b :+ (4L, 5L)): _*)),
      numPartitions = 4, iters = 80)
    val f = r.vector.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val sideA = Seq(1L, 2L, 3L, 4L).map(f(_).signum).toSet
    val sideB = Seq(5L, 6L, 7L, 8L).map(f(_).signum).toSet
    assert(sideA.size == 1 && sideB.size == 1 && sideA != sideB,
      s"signs must split the two cliques: $f")
    // one bridge between two K4s: far below the clique's own λ₂ = 4
    assert(r.lambda2 < 1.0 && r.lambda2 > 0.0)
  }

  test("disconnected graph: lambda2 collapses to 0, components split by sign") {
    val r = Fiedler.run(spark,
      GraphOps.symmetrize(edges((1L, 2L), (2L, 3L), (10L, 11L))),
      numPartitions = 2, iters = 60)
    assert(r.lambda2 < 1e-9)
    val f = r.vector.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(Seq(1L, 2L, 3L).map(f(_).signum).toSet.size == 1)
    assert(f(1L).signum != f(10L).signum)
  }

  test("partitioning moves lambda2 only at float-sum reassociation scale") {
    // multi-term float sums (mean / norm / neighbor sums) reassociate
    // across partitionings — same contract as eigenvector/HITS: equal
    // to ~1e-12 relative, NOT bit-equal (the 6dp driver round absorbs it)
    val g = GraphOps.symmetrize(
      edges((0L until 60L).map(i => (i, (i * 7 + 3) % 60)).filter(p => p._1 != p._2): _*))
    val a = Fiedler.run(spark, g, numPartitions = 2, iters = 10)
    val b = Fiedler.run(spark, g, numPartitions = 8, iters = 10)
    assert(math.abs(a.lambda2 - b.lambda2) <=
      1e-9 * math.max(math.abs(a.lambda2), 1e-30),
      s"${a.lambda2} vs ${b.lambda2}")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expressions are SQL-callable after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT indel_ratio('autmotive', 'automotive') AS r, " +
        "simhash64('a b c') AS s, size(minhash_sig('hello world')) AS m")
      .first()
    assert(math.abs(r.getDouble(0) - 94.736842) < 1e-5)
    assert(r.getLong(1) == functions.SimHash64.simhash(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    assert(r.getInt(2) == 32)
  }

  test("bounded_topk is SQL-callable and keeps the k best (score desc, id asc)") {
    GraftExtensions.register(spark)
    val top = spark.sql(
      """SELECT bounded_topk(s, i, 2) AS t FROM VALUES
         (1.0, 10L), (3.0, 30L), (2.0, 20L), (3.0, 29L) AS v(s, i)""")
      .first().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(top == Seq((3.0, 29L), (3.0, 30L)))
  }

  test("kmv_min / kmv_merge / mix64 are SQL-callable; sketch dedupes and bounds") {
    GraftExtensions.register(spark)
    // 6 values, 4 distinct (7 twice, 9 twice) → k=3 keeps 3 smallest distinct
    val sk = spark.sql(
      """SELECT kmv_min(v, 3) AS sk FROM VALUES
         (9L), (7L), (12L), (7L), (3L), (9L) AS t(v)""")
      .first().getSeq[Long](0)
    assert(sk == Seq(3L, 7L, 9L))
    // merging two sketches unions their distinct values, keeps k smallest
    val mg = spark.sql(
      """SELECT kmv_merge(a, 4) AS sk FROM VALUES
         (array(1L, 5L, 9L)), (array(2L, 5L, 11L)) AS t(a)""")
      .first().getSeq[Long](0)
    assert(mg == Seq(1L, 2L, 5L, 9L))
    // mix64 is a bijection: distinct counts survive the hash
    val n = spark.sql(
      "SELECT count(DISTINCT mix64(x)) FROM range(1000) t(x)")
      .first().getLong(0)
    assert(n == 1000L)
  }

  test("builder-time extensions injection works end-to-end") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s2.sql("SELECT indel_ratio('kitten', 'sitting') AS r").first().getDouble(0)
      assert(math.abs(v - 61.538462) < 1e-5)
    } finally {
      // shared-context: the session piggybacks on the test SparkContext
      s2.catalog.clearCache()
    }
  }
}

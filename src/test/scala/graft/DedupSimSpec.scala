package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextOps

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docsDir = "/root/testdata/sf0.001"
  lazy val docs = spark.read.parquet(s"$docsDir/documents.parquet").cache()

  test("exact dedup: planted copies collapse to min doc_id") {
    val withDups = docs.unionByName(
      docs.filter(col("doc_id") < 20).withColumn("doc_id", col("doc_id") + 5000))
    val out = Dedup.exactDedup(withDups)
    assert(out.count() == docs.count())
    assert(out.filter(col("doc_id") >= 5000).count() == 0)
  }

  test("minhash LSH finds planted near-duplicates (1-token perturbation)") {
    val near = docs.filter(col("doc_id") < 30)
      .withColumn("doc_id", col("doc_id") + 9000)
      .withColumn("text", concat(col("text"), lit(" tail")))
    val all = docs.unionByName(near)
    val pairs = Dedup.minHashNearDups(all, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 30L).map(i => (i, i + 9000)).toSet
    // LSH is probabilistic per banding; with jaccard ≈0.98 on 5-shingles
    // expect essentially all planted pairs found
    val found = expected.intersect(pairs)
    assert(found.size >= 28, s"found only ${found.size}/30 planted pairs")
    // every reported pair must truly exceed the jaccard threshold
    assert(Dedup.minHashNearDups(all, 0.8).filter(col("jaccard") < 0.8).count() == 0)
  }

  test("simhash: near-identical docs land within hamming distance 3") {
    val near = docs.filter(col("doc_id") < 30)
      .withColumn("doc_id", col("doc_id") + 9500)
      .withColumn("text", concat(col("text"), lit(" x")))
    val all = docs.unionByName(near)
    // one extra token on a ~40-token doc flips >3 bits occasionally —
    // recall at hamming ≤ 3 is inherently ~2/3-3/4 on short docs
    val out = Dedup.simHashNearDups(all, maxDist = 3)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 30L).map(i => (i, i + 9500)).toSet
    assert(expected.intersect(pairs).size >= 18,
      s"simhash found ${expected.intersect(pairs).size}/30")
    assert(out.filter(col("dist") > 3).count() == 0)
  }

  test("ngram jaccard: identical docs = 1.0, disjoint < 1") {
    val pairs = Seq((0L, 0L + 0L)).toDF("a", "b") // self pair
    val self = Dedup.ngramJaccard(docs, Seq((0L, 0L)).toDF("a", "b"))
      .first().getDouble(2)
    assert(self == 1.0)
    val cross = Dedup.ngramJaccard(docs, Seq((0L, 1L)).toDF("a", "b"))
      .first().getDouble(2)
    assert(cross < 1.0)
  }

  test("embedding cosine near-dup finds planted identical vectors") {
    val emb = spark.read.parquet(s"$docsDir/embeddings.parquet")
    val planted = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val pairs = Similarity.cosineNearDups(emb.unionByName(planted), threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 20L).map(i => (i, i + 100000L)).toSet
    // identical vectors share every hyperplane bucket → all found
    assert(expected.subsetOf(pairs), s"missing ${expected.diff(pairs).size}")
  }

  test("IVF top-k achieves high recall vs brute force") {
    val emb = spark.read.parquet(s"$docsDir/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
    val centroids = emb.filter(pmod(col("vec_id"), lit(25L)) === 0)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, centroids, queries, k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall") // 64-dim uniform vectors: generous bound
  }

  test("text ops: language id, quality in [0,1], fingerprint order-dependent") {
    val t = Seq(
      (1L, "the cat and the dog went to the market for it is that"),
      (2L, "der hund ist nicht mit der katze und das ist ein haus"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val lang = t.select(col("doc_id"), TextOps.languageId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(lang(1L) == "en" && lang(2L) == "de" && lang(3L) == "und")

    val q = docs.select(TextOps.qualityScore(col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))

    val fp = TextOps.fingerprint(
      Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L)) // order matters
  }
}

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

  test("minhash candidates stay near-linear under planted mass duplicates") {
    // 20k copies of one boilerplate doc: the all-pairs join would emit
    // 2·10^8 candidates; the bucket cap must keep it linear (star form)
    // while every copy stays connected to the group representative
    val mass = spark.range(20000).select((col("id") + 1000000L).as("doc_id"),
      lit("the same boilerplate text repeated for the mass duplicate test")
        .as("text"))
    val all = docs.limit(50).select("doc_id", "text").unionByName(mass)
    val cands = Dedup.minHashCandidates(all, maxBucket = 500)
    val n = cands.count()
    assert(n <= 8L * 21000L, s"candidate count $n is not linear")
    val touched = cands.select(explode(array(col("a"), col("b"))).as("d"))
      .filter(col("d") >= 1000000L).distinct().count()
    assert(touched == 20000L, s"star lost members: $touched/20000")
  }

  test("hotSubBuckets escalation: superset of the star, recovers member-member pairs") {
    // one hot bucket of 24 members (cap 5): the plain star only ever
    // pairs members with the min id 0, so every member-member pair with
    // both ids > 0 is lost; sub-bucketing (s = 8, expected sub size 3)
    // must recover some of those directly while keeping every star edge
    val entries = spark.range(24).select(
      lit(0).as("band"), lit(42L).as("bucket"),
      col("id").as("doc_id"), lit(true).as("anchor"))
    def pairSet(s: Int) =
      Dedup.cappedBucketPairs(entries, maxBucket = 5, hotSubBuckets = s)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = pairSet(1)
    val esc = pairSet(8)
    assert(star.forall(p => p._1 == 0L), s"plain star emitted non-rep pair")
    assert(star.subsetOf(esc), "escalation dropped star edges")
    val recovered = esc.count(p => p._1 > 0L)
    assert(recovered > 0, "escalation recovered no member-member pairs")
    // bounded: each sub-bucket under the cap emits at most C(5,2) pairs
    assert(esc.size <= star.size + 8 * 10, s"escalation not bounded: ${esc.size}")
  }

  test("simhash multi-index blocking: exact for dist ≤ 3, linear under skew") {
    val mass = spark.range(5000).select((col("id") + 2000000L).as("doc_id"),
      lit("identical mass duplicate body for the simhash skew test").as("text"))
    val all = docs.limit(50).select("doc_id", "text").unionByName(mass)
    val out = Dedup.simHashNearDups(all, maxDist = 3, maxBucket = 500)
    val n = out.count()
    assert(n <= 3L * 5100L, s"verified-pair count $n is not linear")
    // identical docs → distance 0 → every mass member in some pair
    val touched = out.select(explode(array(col("a"), col("b"))).as("d"))
      .filter(col("d") >= 2000000L).distinct().count()
    assert(touched == 5000L)
  }

  test("nearDupGroups: transitive chains collapse to one keeper") {
    // a ~ a' ~ a'' where a and a'' may themselves not pair directly —
    // only the connected-components pass groups all three
    val base = docs.filter(col("doc_id") < 20)
    val v1 = base.withColumn("doc_id", col("doc_id") + 7000L)
      .withColumn("text", concat(col("text"), lit(" tailone")))
    val v2 = base.withColumn("doc_id", col("doc_id") + 8000L)
      .withColumn("text", concat(col("text"), lit(" tailone more")))
    val groups = Dedup.nearDupGroups(spark,
        base.unionByName(v1).unionByName(v2), threshold = 0.7, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { i =>
      // the whole chain lands in ONE cluster whose keeper is the base
      // doc's keeper (some base docs are legitimately near-dups of each
      // other in the synthetic corpus, so keeper ≤ i, not == i)
      assert(groups(i) <= i)
      assert(groups(i + 7000L) == groups(i), s"v1 of $i split from base")
      assert(groups(i + 8000L) == groups(i), s"v2 of $i split from base")
    }
  }

  test("bounded_topk brute force ≡ window form, with map-side bounding") {
    val emb = spark.read.parquet(s"$docsDir/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(50L)) === 0)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
    // reference: full window ranking
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    val ref = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qv"), col("cv")), 5).as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    val a = bf.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = ref.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    // the plan aggregates (partial bounded_topk) instead of a global
    // sort+window over the full scored set
    val plan = bf.queryExecution.executedPlan.toString
    assert(plan.contains("bounded_topk"), plan.take(2000))
    assert(!plan.contains("Window"), "full-scored-set window exchange present")
  }

  test("IVF with Lloyd refinement: recall@5 ≥ 0.9 vs brute force at nProbe=4") {
    val emb = spark.read.parquet(s"$docsDir/embeddings.parquet")
    val queries = emb.filter(pmod(col("vec_id"), lit(100L)) === 0)
    val centroids = emb.filter(pmod(col("vec_id"), lit(25L)) === 0)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, centroids, queries, k = 5, nProbe = 4,
        refineIters = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall >= 0.9, s"IVF recall $recall")
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
  test("bandBitsFor tracks log2(n): O(1) per-band occupancy at any scale") {
    assert(Similarity.bandBitsFor(1000L) === 12)          // floor
    assert(Similarity.bandBitsFor(65536L) === 16)         // exact power
    assert(Similarity.bandBitsFor(100000000L) === 27)
    assert(Similarity.bandBitsFor(10000000000L) === 34)   // 10^10 vectors
    assert(Similarity.bandBitsFor(Long.MaxValue) === 62)  // cap: long band key
  }
}

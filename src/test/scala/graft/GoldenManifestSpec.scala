package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** North-rule row invariant: per-row sha256 equality of the normalized
  * entity rows against a RECORDED manifest
  * (src/test/resources/golden_entities_sha_sf0001.txt). Catches any
  * unintended semantic drift in corpus generation, extraction or the
  * normalization chain across code changes; regenerate the golden file
  * only for a deliberate semantics change (see git history of this
  * file for the generator).
  */
class GoldenManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("normalized entity rows match the recorded sha256 manifest (sf0.001)") {
    val snap = SparkEntry.snapshotFor(spark, "/root/testdata/sf0.001")
    val got = snap.entities.select(
      sha2(concat_ws("", col("id"), col("name"),
        coalesce(col("displayName"), lit("")), col("label"),
        coalesce(col("definition"), lit("")),
        concat_ws(",", col("aliases")), concat_ws(",", col("sourceSpans"))), 256).as("sha"))
      .orderBy("sha").collect().map(_.getString(0)).toSeq

    val want = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_entities_sha_sf0001.txt"), "UTF-8")
      .getLines().toSeq

    assert(got.length == want.length,
      s"row count drift: got ${got.length}, manifest ${want.length}")
    got.zip(want).zipWithIndex.collectFirst {
      case ((g, w), i) if g != w => i
    }.foreach(i => fail(s"first sha mismatch at sorted row $i"))
  }
}

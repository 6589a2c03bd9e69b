package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** URL canonicalization corner cases. */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowering leaves the path case alone") {
    assert(canon("HTTPS://WWW.Ex.COM/Path/File") ===
      Seq("https://www.ex.com/Path/File"))
  }

  test("default ports stripped only when they match the scheme") {
    assert(canon("https://a.com:443/x", "http://a.com:80/x",
      "http://a.com:443/x", "https://a.com:8080/x") ===
      Seq("https://a.com/x", "http://a.com/x",
        "http://a.com:443/x", "https://a.com:8080/x"))
  }

  test("tracking params dropped, survivors sorted, fragment gone") {
    assert(canon("http://a.com/p?z=1&utm_campaign=c&a=2&fbclid=f#sec") ===
      Seq("http://a.com/p?a=2&z=1"))
  }

  test("trailing slash and empty query collapse") {
    assert(canon("http://a.com/p/", "http://a.com/?utm_source=x") ===
      Seq("http://a.com/p", "http://a.com"))
  }
}

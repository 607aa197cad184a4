package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl($"u"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: each normalization, pinned") {
    val cases = Seq(
      // scheme+host case, www, fragment
      "HTTP://WWW.Example.COM/a#frag" -> "http://example.com/a",
      // default ports drop, non-default kept
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      // https default port is NOT http's
      "https://example.com:80/a" -> "https://example.com:80/a",
      // path: dup slashes, trailing slash, empty path, case preserved
      "http://example.com//A//b///" -> "http://example.com/A/b",
      "http://example.com" -> "http://example.com/",
      "http://example.com/" -> "http://example.com/",
      // userinfo dropped; trailing host dot
      "http://user:pw@example.com./x" -> "http://example.com/x",
      // tracking params out, rest sorted; empty query dropped
      "http://e.com/p?utm_source=x&b=2&a=1" -> "http://e.com/p?a=1&b=2",
      "http://e.com/p?utm_source=x&utm_campaign=y" -> "http://e.com/p",
      "http://e.com/p?gclid=abc&ref=tw&z=9" -> "http://e.com/p?z=9",
      // schemeless input defaults to http
      "Example.com/x?b=2" -> "http://example.com/x?b=2",
      // query param values are case-preserved, keys sorted byte-wise
      "http://e.com/p?B=2&a=1" -> "http://e.com/p?B=2&a=1"
    )
    cases.foreach { case (in, want) =>
      assert(canon(in) === Seq(want), s"input: $in")
    }
  }

  test("UrlGen invariant: canon groups == entities, exactly") {
    val n = 600; val ents = 150
    val urls = graft.gen.UrlGen.urls(spark, n, ents)
    val withCanon = urls.select($"url_id",
      pmod($"url_id", lit(ents)).as("entity"),
      UrlFunctions.canonicalizeUrl($"url").as("canon"))
    // every entity collapses to ONE canon, and no two entities collide
    val perEntity = withCanon.groupBy("entity")
      .agg(countDistinct($"canon").as("n_canon"))
      .where($"n_canon" =!= 1).count()
    assert(perEntity === 0L)
    assert(withCanon.select("canon").distinct().count() === ents.toLong)
  }

  test("canonicalization is idempotent on the generated corpus") {
    val urls = graft.gen.UrlGen.urls(spark, 300, 75)
    val once = urls.select(UrlFunctions.canonicalizeUrl($"url").as("c1"))
    val twice = once.select($"c1",
      UrlFunctions.canonicalizeUrl($"c1").as("c2"))
    assert(twice.where($"c1" =!= $"c2").count() === 0L)
  }
}

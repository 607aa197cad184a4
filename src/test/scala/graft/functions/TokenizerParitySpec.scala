package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins GraftFunctions.tokensJvm / tokensUdf to the declarative `tokens`
  * chain: element-identical arrays on every input, including unicode,
  * whitespace variants, empties and null. */
class TokenizerParitySpec extends SparkSuite {
  import spark.implicits._

  test("tokensUdf == tokens on diverse texts") {
    val texts = Seq(
      "The Quick BROWN fox 42 jumps!",
      "",
      "   ",
      "!!!---___",
      "Ünïcödé GRÖSSE straße İstanbul ΣΊΣΥΦΟΣ",
      "tab\tnewline\nand\r\nmixed 123abc456",
      "a",
      "trailing spaces   ",
      "   leading",
      "emoji 😀 between 🎉 tokens")
    val df = texts.toDF("text")
    val got = df.select(GraftFunctions.tokensUdf($"text").as("t"))
      .as[Seq[String]].collect().toSeq
    val want = df.select(GraftFunctions.tokens($"text").as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got === want)
  }

  test("tokensUdf null propagation matches the column chain") {
    val df = Seq[Option[String]](None, Some("x y")).toDF("text")
    val got = df.select(GraftFunctions.tokensUdf($"text").as("t"))
      .collect().map(r => Option(r.get(0)))
    val want = df.select(GraftFunctions.tokens($"text").as("t"))
      .collect().map(r => Option(r.get(0)))
    assert(got.map(_.isDefined).toSeq === want.map(_.isDefined).toSeq)
  }

  test("tokensUdf == tokens on a generated fuzz corpus") {
    val rnd = new scala.util.Random(23)
    val chars = "abcXYZ019 .,!@#\t\nüÖß"
    val texts = (1 to 300).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => chars(rnd.nextInt(chars.length)))
        .mkString
    }
    val df = texts.toDF("text")
    val got = df.select(GraftFunctions.tokensUdf($"text").as("t"))
      .as[Seq[String]].collect().toSeq
    val want = df.select(GraftFunctions.tokens($"text").as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got === want)
  }
}

package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("F8: priceParse survives dirty input under ANSI mode (no throw)") {
    val df = Seq("19.99", "$1,234.50", "USD 1.29", "free", "€5.99", "n/a",
      "unknown", "  12 ", "1.2.3").toDF("p")
    val out = df.select($"p", GraftFunctions.priceParse($"p").as("v"),
        GraftFunctions.priceRender($"p").as("r"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("19.99") === Some(19.99))
    assert(out("$1,234.50") === Some(1234.50))
    assert(out("USD 1.29") === Some(1.29)) // iTunes/process.py:101
    assert(out("free") === None)           // reference: "unknown", not a crash
    assert(out("€5.99") === None)
    assert(out("n/a") === None)
    assert(out("  12 ") === Some(12.0))
    assert(out("1.2.3") === None)
    val rendered = df.select(GraftFunctions.priceRender($"p")).collect()
    assert(rendered.forall(_.getString(0) != null)) // render never null
  }

  test("F5/F6/F7: envelope chain strips fences, slices JSON, decodes") {
    val schema = StructType(Seq(
      StructField("title", StringType), StructField("price", StringType)))
    val df = Seq(
      "```json\n{\"title\": \"Acer Aspire\", \"price\": \"1.29\"}\n```",
      "Here is the answer: {\"title\": \"HP\", \"price\": \"2\"} thanks!",
      "{\"title\": \"Plain\", \"price\": null}",
      "no json at all",
      "```\nbroken { not json\n```").toDF("raw")
    val out = df.select(
      GraftFunctions.parseJsonEnvelope($"raw", schema).as("j")).collect()
    assert(out(0).getStruct(0).getString(0) === "Acer Aspire")
    assert(out(1).getStruct(0).getString(0) === "HP")   // noise around object
    assert(out(2).getStruct(0).getString(0) === "Plain")
    // M3 fallback: malformed payload decodes to an all-null struct — the
    // reference's json.JSONDecodeError → {} → defaults path; never a throw
    assert(out(3).getStruct(0).toSeq.forall(_ == null))
    assert(out(4).getStruct(0).toSeq.forall(_ == null))
  }

  test("F5: code-fence strip leaves non-fenced text intact") {
    val df = Seq("```scala\ncode\n```", "plain").toDF("s")
    val out = df.select(GraftFunctions.stripCodeFence($"s")).as[String].collect()
    assert(out(0) === "code\n")
    assert(out(1) === "plain")
  }
}

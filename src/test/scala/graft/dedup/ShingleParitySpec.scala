package graft.dedup

import graft.SparkSuite
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Pins the JVM wordShingles rewrite to the previous declarative
  * formulation (transform/sequence/element_at/concat_ws over
  * GraftFunctions.tokens): element-identical arrays on every input the
  * old chain could evaluate. The old chain threw under ANSI for texts
  * with fewer than w tokens (sequence(1,0) descends into
  * element_at(·,0)), so those inputs are asserted against the natural
  * truncated-shingle semantics instead. */
class ShingleParitySpec extends SparkSuite {
  import spark.implicits._

  /** The pre-rewrite pure-expression formulation, verbatim. */
  private def declarativeShingles(textCol: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column = {
    val shingled = transform(array(GraftFunctions.tokens(textCol)), toks => {
      val count = greatest(size(toks) - lit(w - 1), lit(0))
      transform(sequence(lit(1), count), i =>
        concat_ws(" ", (0 until w).map(o => element_at(toks, i + o)): _*))
    })
    array_distinct(element_at(shingled, 1))
  }

  test("UDF shingles == declarative shingles on diverse texts (w=3)") {
    val texts = Seq(
      "The Quick BROWN fox jumps over the lazy dog",
      "a b c",
      "a b c a b c a b c",   // duplicate shingles -> dedup order
      "  punct!!! and---dashes___ 123 mixed42tokens  ",
      "Ünïcödé ÅÄÖ text MIT größe ss 12köln straße test",
      "tab\tand\nnewline separated words here",
      "repeat repeat repeat repeat",
      "numbers 111 222 333 444 555")
    val df = texts.toDF("text")
    val got = df.select(Dedup.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    val want = df.select(declarativeShingles($"text", 3).as("s"))
      .as[Seq[String]].collect()
    assert(got.toSeq === want.toSeq)
  }

  test("UDF shingles == declarative shingles at w=2 and on a generated corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "Gamma", "DELTA", "epsilon42", "ζeta")
    for (w <- Seq(2, 3, 4)) {
      // at least w tokens: the OLD chain throws under ANSI below that
      // (the hazard the UDF removes — covered by the short-text test)
      val texts = (1 to 200).map { _ =>
        (0 until (w + rnd.nextInt(12)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val df = texts.toDF("text")
      val got = df.select(Dedup.wordShingles($"text", w).as("s"))
        .as[Seq[String]].collect()
      val want = df.select(declarativeShingles($"text", w).as("s"))
        .as[Seq[String]].collect()
      assert(got.toSeq === want.toSeq, s"w=$w")
    }
  }

  test("short/empty/null texts yield the truncated shingle, not an error") {
    val df = Seq("one two", "single", "", "!!!", null: String).toDF("text")
    val got = df.select(Dedup.wordShingles($"text", 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got === Seq(Seq("one two"), Seq("single"), Nil, Nil, Nil))
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MixtureSpec extends SparkSuite {
  import spark.implicits._

  // 3 domains, ~equal cost mass per domain (~50k units each)
  private lazy val corpus = (1L to 3000L)
    .map(i => (i, s"dom${i % 3}", 30L + (i * 11) % 40))
    .toDF("id", "dom", "cost")

  test("unlisted domains are excluded; per-domain mass tracks budget*weight") {
    val budget = 30000L
    // no .cache(): the shared-session CacheManager must stay empty
    val out = Mixture.tokenBudgetSample(corpus, $"dom", $"id", $"cost",
      Seq("dom0" -> 0.6, "dom1" -> 0.4), budget)
    assert(out.where($"dom" === "dom2").count() === 0L)
    val got = out.groupBy($"dom").agg(sum($"cost").as("mass"))
      .as[(String, Long)].collect().toMap
    // hash sampling is binomial-ish: allow 15% relative tolerance
    assert(math.abs(got("dom0") - 18000L) < 2700,
      s"dom0 mass ${got("dom0")} vs target 18000")
    assert(math.abs(got("dom1") - 12000L) < 1800,
      s"dom1 mass ${got("dom1")} vs target 12000")
  }

  test("rate caps at 1.0 — a domain smaller than its share is kept whole") {
    // dom0 holds ~50k units; a 1M budget at weight 0.9 wants 900k -> rate 1
    val out = Mixture.tokenBudgetSample(corpus, $"dom", $"id", $"cost",
      Seq("dom0" -> 0.9), budget = 1000000L)
    assert(out.count() === corpus.where($"dom" === "dom0").count())
  }

  test("membership is a pure function of the key (stable across partitioning)") {
    val w = Seq("dom0" -> 0.5, "dom1" -> 0.2, "dom2" -> 0.3)
    val a = Mixture.tokenBudgetSample(corpus, $"dom", $"id", $"cost", w, 20000L)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Mixture.tokenBudgetSample(corpus.repartition(17), $"dom", $"id",
        $"cost", w, 20000L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("sampling commutes with consistent per-key sampling (Broder property)") {
    // a row kept at rate r is also kept at any rate >= r for the same key:
    // mixture membership with a bigger budget is a superset
    val w = Seq("dom0" -> 0.5, "dom1" -> 0.5)
    val small = Mixture.tokenBudgetSample(corpus, $"dom", $"id", $"cost", w, 15000L)
      .select("id").as[Long].collect().toSet
    val big = Mixture.tokenBudgetSample(corpus, $"dom", $"id", $"cost", w, 40000L)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("input columns colliding with mx_* temporaries are rejected") {
    val bad = corpus.withColumn("mx_rate", lit(1.0))
    val ex = intercept[IllegalArgumentException] {
      Mixture.tokenBudgetSample(bad, $"dom", $"id", $"cost",
        Seq("dom0" -> 1.0), 1000L)
    }
    assert(ex.getMessage.contains("Mixture temporaries"))
  }
}

package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSuite

class LmQualitySpec extends SparkSuite {
  import spark.implicits._

  // corpus dominated by fluent repeated phrasing + two degenerate docs
  private lazy val corpus = {
    val fluent = (0L until 60L).map { i =>
      (i, s"the quick brown fox jumps over the lazy dog number ${i % 5}")
    }
    val junk = Seq(
      (100L, "dog the jumps quick lazy fox brown over the number"), // shuffled
      (101L, "zxq1 wk9 zxq1 wk9 plv plv zxq1"),                     // oov stuffing
      (102L, "single"),                                              // no bigram
      (103L, ""))                                                    // empty
    (fluent ++ junk).toDF("doc_id", "text")
  }

  // localCheckpoint, not cache: materializes once but leaves the shared
  // session's CacheManager empty (DittoConverterSpec asserts suite-global
  // emptiness)
  private lazy val scored = LmQuality.bigramScores(corpus, $"doc_id", $"text")
    .localCheckpoint()

  test("fluent text outscores shuffled and OOV-stuffed text") {
    val s = scored.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.toString.toDouble))
      .toMap
    val fluentAvg = (0L until 60L).map(s(_).get).sum / 60.0
    assert(s(100L).get < fluentAvg, s"shuffled ${s(100L)} vs fluent $fluentAvg")
    assert(s(101L).get < fluentAvg, s"oov ${s(101L)} vs fluent $fluentAvg")
  }

  test("docs without bigrams get n_bigrams=0 and a null score, not a crash") {
    val rows = scored.where($"lm_id" >= 102L)
      .select($"lm_id", $"n_bigrams", $"avg_ll".isNull)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(rows === Set((102L, 0L, true), (103L, 0L, true)))
    assert(scored.count() === 64L) // every doc present exactly once
  }

  test("scores are deterministic across input partitioning") {
    val a = scored.collect().map(r => (r.getLong(0), String.valueOf(r.get(2)))).toSet
    val b = LmQuality.bigramScores(corpus.repartition(13), $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(2)))).toSet
    assert(a === b)
  }

  test("probabilities are proper: every bigram log-prob is negative") {
    // avg of ln P must be < 0 whenever defined (P < 1 strictly: add-k
    // smoothing spreads mass over the whole vocab)
    assert(scored.where($"avg_ll" >= 0.0).count() === 0L)
  }
}

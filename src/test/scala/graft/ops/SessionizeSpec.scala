package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import java.sql.Timestamp

class SessionizeSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("sessionize: strict-gap split, first event opens session 1, keys independent") {
    val ev = Seq(
      // user 1: gaps 10, 100 (> 60 -> split), 60 (== gap -> NOT split)
      (1L, 1L, ts(0)), (2L, 1L, ts(10)), (3L, 1L, ts(110)), (4L, 1L, ts(170)),
      // user 2: single event
      (5L, 2L, ts(1000)),
      // user 3: every gap splits
      (6L, 3L, ts(0)), (7L, 3L, ts(61)), (8L, 3L, ts(200))
    ).toDF("event_id", "user_id", "t")

    val out = Sessionize.sessionize(ev, $"user_id", $"t", $"event_id", 60)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap

    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 2L, 8L -> 3L))
  }

  test("equal-timestamp events share a session; tiebreak keeps it deterministic") {
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(100)), (3L, 1L, ts(100)), (4L, 1L, ts(100))
    ).toDF("event_id", "user_id", "t")
    val out = Sessionize.sessionize(ev, $"user_id", $"t", $"event_id", 60)
      .select($"event_id", $"session_seq").as[(Long, Long)].collect().toMap
    // ts=100 trio: first (by event_id) splits from ts=0; the tied rest ride along
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("sessionStats rolls up without a second exchange; parallelism-invariant") {
    val ev = (0L until 200L).map { i =>
      (i, i % 7, ts(i / 7 * 40 + (i % 3) * 500))
    }.toDF("event_id", "user_id", "t")

    val stats = Sessionize.sessionStats(
      Sessionize.sessionize(ev, $"user_id", $"t", $"event_id", 60),
      $"user_id", $"t", Seq(sum($"event_id").as("id_sum")))
    // AQE off so the compiled plan's exchanges are directly inspectable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val inspect = Sessionize.sessionStats(
        Sessionize.sessionize(ev, $"user_id", $"t", $"event_id", 60),
        $"user_id", $"t", Seq(sum($"event_id").as("id_sum")))
      val exchanges = inspect.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size === 1,
        s"expected 1 shuffle (window+agg share user_id hash):\n${inspect.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    val again = Sessionize.sessionStats(
      Sessionize.sessionize(ev.repartition(13), $"user_id", $"t", $"event_id", 60),
      $"user_id", $"t", Seq(sum($"event_id").as("id_sum")))
    assert(stats.orderBy("user_id", "session_seq").collect().toSeq ===
      again.orderBy("user_id", "session_seq").collect().toSeq)
  }
}

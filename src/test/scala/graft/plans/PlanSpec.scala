package graft.plans

import graft.SparkSuite
import graft.SparkEntry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/**
 * Physical-plan assertions: the properties that make these operators
 * viable at 100 TB — predicate pushdown into the parquet scan, column
 * pruning, broadcast of small join sides, map-side partial aggregation,
 * whole-stage codegen on the hot paths. A regression here is a
 * performance bug even when results stay correct.
 */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection reach the parquet scan (pushdown + pruning)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("q3 join broadcasts the small customer dimension") {
    val plan = planString(SparkEntry.queries("q3_join_agg")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q1 aggregation is partial (map-side combine) and codegen'd") {
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    val plan = planString(df)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_sum"), plan) // map-side combine
    df.collect() // finalize the adaptive plan, then check codegen stages
    // The AQE final plan renders codegen stages as "*(n) Op", not the
    // literal "WholeStageCodegen" — match the star marker instead.
    val finalPlan = planString(df)
    assert(finalPlan.contains("*("), finalPlan)
  }

  test("threshold sweep aggregates partially and shuffles only counts") {
    import spark.implicits._
    // AQE off so the compiled plan's exchanges are directly inspectable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val log = Seq((1, 0.9, "payload left"), (0, 0.4, "payload right"),
        (1, 0.6, "x")).toDF("gold", "probability", "text_left")
      val df = graft.eval.Metrics.prAtThresholds(log, Seq(0.3, 0.5, 0.7))
      val plan = planString(df)
      // map-side combine: confusion counts partial-aggregate before the
      // 4-longs-per-threshold exchange — the property that keeps the
      // sweep log-size-independent on the shuffle
      assert(plan.contains("partial_sum"), plan)
      // the exploded rows carry (gold, prob, threshold) only — the log's
      // payload columns are pruned before the fan-out and nothing
      // string-typed crosses an exchange
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach { e =>
        assert(!e.child.schema.fields.exists(_.dataType.typeName == "string"),
          s"payload crossed the sweep exchange: ${e.child.schema}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("extraction + blocking stage is shuffle-free (narrow maps only)") {
    val ex = graft.pipeline.ERPipeline.extract(
      graft.gen.PageGen.pages(spark, 50, seed = 1L))
    val plan = planString(ex)
    assert(!plan.contains("Exchange"), s"unexpected shuffle in extract:\n$plan")
  }

  test("ER candidate join shuffles slim block rows, never titles/token arrays") {
    // at-scale (shuffle-join) config: the block-key self-join and pair
    // dedup must exchange only (block_key, id, token_fp)-shaped rows;
    // payloads may move only through the post-dedup id-join attach.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE off so the compiled plan's exchanges are directly inspectable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val cfg = graft.pipeline.ERPipeline.Config(payloadBroadcastMaxRows = 0L)
    val ex = graft.pipeline.ERPipeline.extract(
      graft.gen.PageGen.pages(spark, 80, seed = 2L)).localCheckpoint()
    val blocked = graft.pipeline.ERPipeline.block(ex, cfg, Some(ex.count()))
    val (scored, _) = graft.pipeline.ERPipeline.scorePairs(ex, blocked, cfg)
    val exchanges = scored.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s.output.map(_.name)
    }
    assert(exchanges.nonEmpty)
    val blockJoinExchanges = exchanges.filter(_.exists(_.contains("block_key")))
    assert(blockJoinExchanges.nonEmpty, s"no block-key exchange found: $exchanges")
    blockJoinExchanges.foreach { cols =>
      assert(!cols.exists(c => c.contains("norm_title") || c.contains("tokens")),
        s"payload column shuffled through the candidate join: $cols")
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("anti-join stays a broadcast on a small build side") {
    val plan = planString(SparkEntry.queries("q5_anti_join")(spark, dir))
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
  }
}

package graft.eval

import graft.SparkSuite
import graft.convert.DittoConverter
import org.apache.spark.sql.functions._

class EvalLogSpec extends SparkSuite {
  import spark.implicits._

  test("S6: eval-log TSV round trip preserves counts and result classes") {
    val dir = java.nio.file.Files.createTempDirectory("evallog").toString
    val df = Seq(
      (1, 1, 0.97, "COL title VAL a", "COL title VAL a2"),
      (0, 1, 0.81, "COL title VAL b", "COL title VAL c"),
      (1, 0, 0.12, "COL title VAL d", "COL title VAL d2"),
      (0, 0, 0.03, "COL title VAL e", "COL title VAL f"))
      .toDF("gold", "pred", "probability", "text_left", "text_right")
    Metrics.writeEvalLog(df, s"$dir/log")
    val back = Metrics.readEvalLog(spark, s"$dir/log")
    assert(back.count() === 4)
    assert(back.select("result").as[String].collect().sorted ===
      Array("FN", "FP", "TN", "TP"))
    val m = Metrics.prf1(back).collect()(0)
    assert(m.getAs[Long]("tp") === 1L && m.getAs[Long]("fn") === 1L)
  }

  test("§3.3 sweep: reproduces the reference run's committed epoch metrics") {
    // BASELINE.md rows 1-2: best epoch (test11updaetmore.tsv) F1 0.7695
    // (TP=242 FP=88 FN=57 TN=711), epoch 11 F1 0.7507 (TP=253 FP=122
    // FN=46 TN=677) — recomputed here from the logs' (gold, pred).
    def counts(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    val best = Metrics.readEvalLog(spark,
      "/root/reference/datamodel/test11updaetmore.tsv")
    val mBest = Metrics.prf1(best).collect()(0)
    assert(counts(mBest) === ((242L, 88L, 57L, 711L)))
    assert(math.abs(mBest.getAs[Double]("f1") - 0.7695) < 1e-4)
    val ep11 = Metrics.readEvalLog(spark,
      "/root/reference/datamodel/test_log_epoch11.tsv")
    val mEp = Metrics.prf1(ep11).collect()(0)
    assert(counts(mEp) === ((253L, 122L, 46L, 677L)))
    assert(math.abs(mEp.getAs[Double]("f1") - 0.7507) < 1e-4)
  }

  test("§3.3 sweep: prAtThresholds over the reference probability column") {
    val log = Metrics.readEvalLog(spark,
      "/root/reference/datamodel/test11updaetmore.tsv")
    val sweep = Metrics.prAtThresholds(log, Seq(0.1, 0.3, 0.5, 0.7, 0.9))
      .collect()
    assert(sweep.length === 5)
    // gold positives are threshold-invariant: tp + fn = 299 at every row
    assert(sweep.forall(r =>
      r.getAs[Long]("tp") + r.getAs[Long]("fn") === 299L))
    // raising the threshold can only demote predictions: recall
    // nonincreasing, tn nondecreasing
    val recalls = sweep.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a })
    val tns = sweep.map(_.getAs[Long]("tn"))
    assert(tns.zip(tns.tail).forall { case (a, b) => b >= a })
    // one-pass sweep ≡ direct per-threshold recomputation
    val direct = Metrics.prf1(log.withColumn("pred",
      (col("probability") >= 0.5).cast("int"))).collect()(0)
    val at05 = sweep.find(_.getAs[Double]("threshold") == 0.5).get
    for (c <- Seq("tp", "fp", "fn", "tn"))
      assert(at05.getAs[Long](c) === direct.getAs[Long](c), c)
    // the probability column is its own signal: the committed pred is the
    // model's argmax, NOT probability >= 0.5 (95 rows differ) — assert the
    // sweep sees that distinction rather than silently collapsing to pred
    val committed = Metrics.prf1(log).collect()(0)
    def c4(r: org.apache.spark.sql.Row) = Seq("tp", "fp", "fn", "tn").map(r.getAs[Long](_))
    assert(c4(at05) !== c4(committed))
  }

  test("computer.py title-only converter: header shape and extraction") {
    val lines = Seq(
      "COL title VAL Dell XPS 13 \"9310\"@en\tCOL title VAL Dell XPS13 9310\t1",
      "COL brand VAL NoTitle\tCOL title VAL X\t0",
      "bad line").toDF("value")
    val out = DittoConverter.convertTitleOnly(spark, lines)
    assert(out.columns.toSeq === Seq("id", "label", "title_left", "title_right"))
    val rows = out.collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[String]("title_left") === "Dell XPS 13 9310")
    assert(rows(1).getAs[String]("title_left") === "") // no title field
  }
}

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

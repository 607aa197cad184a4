package graft.convert

import graft.SparkSuite
import java.nio.file.Files

/** S4/S5 sink + split-iteration coverage (SURVEY.md §2.1). */
class SinkSpec extends SparkSuite {
  import spark.implicits._

  private val line =
    "COL title VAL Acer Aspire COL brand VAL Acer\tCOL title VAL Acer Aspire 5\t1"

  test("S4: quoted CSV sink round-trips through a Spark scan") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = DittoConverter.convertLines(spark, Seq(line).toDF("value"),
      DittoConverter.Config(robust = true))
    DittoConverter.writeCsv(df, s"$dir/out")
    val back = spark.read.option("header", true).csv(s"$dir/out")
    assert(back.columns.toSeq === df.columns.toSeq)
    assert(back.count() === 1)
    assert(back.collect()(0).getAs[String]("left_title") === "Acer Aspire")
  }

  test("S4b: reference CSV writer round-trips bytes to disk") {
    val dir = Files.createTempDirectory("graft-refcsv").toString
    val df = DittoConverter.convertLines(spark, Seq(line).toDF("value"),
      DittoConverter.Config(robust = true))
    DittoConverter.writeReferenceCsv(df, s"$dir/out")
    val lines = spark.read.text(s"$dir/out").collect().map(_.getString(0))
    assert(lines.head === "\"id\",\"label\",\"left_brand\",\"right_brand\",\"left_title\",\"right_title\"" ||
      lines.head.startsWith("\"id\",\"label\""))
    assert(lines.length === 2)
  }

  test("S5: split-set iteration skips missing files, converts present ones") {
    val dir = Files.createTempDirectory("graft-splits").toString
    Files.writeString(java.nio.file.Paths.get(dir, "train.txt"), line + "\n")
    Files.writeString(java.nio.file.Paths.get(dir, "test.txt"),
      line + "\n" + line + "\n")
    // valid.txt intentionally absent (Amazon/prompt.py:250-257: skipped)
    val out = DittoConverter.convertSplits(spark, dir,
      DittoConverter.Config(robust = true))
    assert(out.keySet === Set("train", "test"))
    assert(out("train").count() === 1)
    assert(out("test").count() === 2)
  }
}

package graft.convert

import graft.SparkSuite

class DittoConverterSpec extends SparkSuite {
  import spark.implicits._

  private val lines = Seq(
    "COL title VAL Acer Aspire 5 COL brand VAL Acer\tCOL title VAL Acer Aspire5 COL brand VAL acer\t1",
    "COL title VAL HP Pavilion COL year VAL published 2019 edition\tCOL title VAL HP Pavillion\t0",
    "",                                    // blank → dropped (P3)
    "only\ttwo",                           // malformed → dropped (P1)
    "COL title VAL X\tCOL title VAL Y\tnope", // bad label → dropped (P2)
    "COL a VAL 1\t\tCOL a VAL 2\t\t1")     // multi-tab tolerant (robust)

  test("robust convert: filters, 2-pass schema, ordering, dense ids") {
    val df = DittoConverter.convertLines(spark, lines.toDF("value"),
      DittoConverter.Config(robust = true,
        preferredOrder = Seq("title", "brand"), normalizeYear = true))
    val out = df.collect()
    assert(out.length === 3)
    assert(df.columns.toSeq === Seq("id", "label",
      "left_title", "right_title", "left_brand", "right_brand",
      "left_a", "right_a", "left_year", "right_year"))
    assert(out.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    val r0 = out(0)
    assert(r0.getAs[String]("left_title") === "Acer Aspire 5")
    assert(r0.getAs[String]("right_brand") === "acer")
    val r1 = out(1)
    assert(r1.getAs[String]("left_year") === "2019") // dcm.py:93-97 year fix
    val r2 = out(2)
    assert(r2.getAs[String]("left_a") === "1" && r2.getAs[String]("right_a") === "2")
  }

  test("strict convert splits on single tabs only") {
    val df = DittoConverter.convertLines(spark, lines.toDF("value"),
      DittoConverter.Config(robust = false))
    // the multi-tab line has 5 single-tab parts → dropped under strict
    assert(df.count() === 2)
  }

  test("convert leaves no CacheManager entries behind (no storage leak)") {
    val df = DittoConverter.convertLines(spark, lines.toDF("value"),
      DittoConverter.Config(robust = true))
    df.count()
    // localCheckpoint blocks are ContextCleaner-managed; the leak mode the
    // round-2 advice flagged is an unpersisted df.cache() — assert none
    assert(spark.sharedState.cacheManager.isEmpty,
      "convertLines must not leave cached plans in the CacheManager")
  }

  test("reference CSV writer: QUOTE_NONNUMERIC byte layout") {
    val df = DittoConverter.convertLines(spark,
      Seq("COL title VAL A \"quoted\" value\tCOL title VAL B\t1").toDF("value"),
      DittoConverter.Config(robust = true))
    val csv = DittoConverter.referenceCsvLines(df)
      .collect().map(_.getString(0)).toSeq
    // pandas QUOTE_NONNUMERIC quotes header labels (they are strings):
    assert(csv.head === "\"id\",\"label\",\"left_title\",\"right_title\"")
    assert(csv(1) === "0,1,\"A \"\"quoted\"\" value\",\"B\"")
  }
}

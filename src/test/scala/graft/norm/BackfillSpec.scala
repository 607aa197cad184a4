package graft.norm

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BackfillSpec extends SparkSuite {
  import spark.implicits._

  test("R15: price/time/date/genre back-filled from Song_Name text") {
    val df = Seq(
      (0, 1,
        "Still Down $1.29 3:05 released 26-Aug-11 Dance hit", "VAL -", "VAL -", "VAL -", "VAL -",
        "Still Down", "USD 1.29", "03:05", "2011-08-26", "Dance"),
      (1, 0,
        "Plain Song", "VAL -", "4:02", "May 18, 2015", "Country",
        "Widescreen 16:9 Cut", "VAL -", "VAL -", "VAL -", "VAL -"))
      .toDF("id", "label",
        "left_Song_Name", "left_Price", "left_Time", "left_Released", "left_Genre",
        "right_Song_Name", "right_Price", "right_Time", "right_Released", "right_Genre")
    val out = Backfill.itunes(df).collect().map(r => r.getInt(0) -> r).toMap
    // row 0: everything extracted from the left text
    assert(out(0).getAs[String]("left_Price") === "USD 1.29")
    assert(out(0).getAs[String]("left_Time") === "03:05")
    assert(out(0).getAs[String]("left_Released") === "2011-08-26")
    assert(out(0).getAs[String]("left_Genre") === "Dance")
    // pre-existing values survive untouched
    assert(out(1).getAs[String]("left_Time") === "4:02")
    assert(out(1).getAs[String]("left_Released") === "May 18, 2015")
    // nothing to extract → stays null (rendered later by enrich)
    assert(out(1).getAs[String]("right_Price") === null)
    // an aspect ratio ("16:9" — single-digit seconds) is NOT a duration
    assert(out(1).getAs[String]("right_Time") === null)
  }

  test("backfill then enrich yields the reference's rendered forms") {
    val df = Seq((0, 1,
      "Titanium $1.29 4:05 26-Aug-11", "David Guetta", "Album", "VAL -",
      "VAL -", "(C) X", "VAL -", "VAL -",
      "Titanium", "David Guetta", "Album", "Dance",
      "USD 1.29", "(C) X", "04:05", "2011-08-26"))
      .toDF("id", "label",
        "left_Song_Name", "left_Artist_Name", "left_Album_Name", "left_Genre",
        "left_Price", "left_CopyRight", "left_Time", "left_Released",
        "right_Song_Name", "right_Artist_Name", "right_Album_Name", "right_Genre",
        "right_Price", "right_CopyRight", "right_Time", "right_Released")
    val out = Enrichment.enrich(Backfill.itunes(df), Enrichment.itunes).collect()(0)
    assert(out.getAs[String]("left_Price") === "USD 1.29")
    assert(out.getAs[String]("left_Time") === "04:05")
    assert(out.getAs[String]("left_Released") === "2011-08-26")
    assert(out.getAs[String]("right_Time") === "04:05")
  }
}

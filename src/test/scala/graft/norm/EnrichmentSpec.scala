package graft.norm

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EnrichmentSpec extends SparkSuite {
  import spark.implicits._

  test("amazon: price coercion, manufacturer canon, closed schema") {
    val df = Seq(
      (0, 1, "Adobe  Photoshop CS3 CS3", "Adobe Systems Inc", "$1,299.00",
        "Photoshop CS3", "Adobe", "n/a"),
      (1, 0, "Corel Draw", "Corel Corp.", "12.5",
        "Paint Shop", "", "unknown"))
      .toDF("id", "label", "left_title", "left_manufacturer", "left_price",
        "right_title", "right_manufacturer", "right_price")
    val out = Enrichment.enrich(df, Enrichment.amazon).collect()
    assert(out(0).getAs[String]("left_price") === "1299.00")
    assert(out(0).getAs[String]("right_price") === "unknown")
    assert(out(0).getAs[String]("left_manufacturer") === "Adobe") // R4 table
    assert(out(0).getAs[String]("left_title") === "Adobe Photoshop Creative Suite 3")
    assert(out(1).getAs[String]("left_price") === "12.50")
    assert(out(1).getAs[String]("right_manufacturer") === "unknown")
    val cols = Enrichment.enrich(df, Enrichment.amazon).columns.toSeq
    assert(cols === Seq("id", "label", "left_title", "right_title",
      "left_manufacturer", "right_manufacturer", "left_price", "right_price"))
  }

  test("beer: key renaming, style split, abv + boolean coercion") {
    val df = Seq((0, 1, "old  rasputin imperial stout", "North Coast Brewing Co.",
      "American Amber / Red Ale", "9.2 %", "", "yes",
      "Old Rasputin", "north coast", "Red Ale", "unknown", "1", "no"))
      .toDF("id", "label",
        "left_Beer_Name", "left_Brew_Factory_Name", "left_Style", "left_ABV",
        "left_is_amber", "left_is_ale",
        "right_Beer_Name", "right_Brew_Factory_Name", "right_Style",
        "right_ABV", "right_is_amber", "right_is_ale")
    val out = Enrichment.enrich(df, Enrichment.beer).collect()(0)
    assert(out.getAs[String]("left_name") === "Old Rasputin Imperial Stout")
    assert(out.getAs[String]("left_brewery") === "North Coast Brewing")
    assert(out.getAs[String]("left_primary_style") === "Red Ale")
    assert(out.getAs[String]("left_secondary_style") === "Amber")
    assert(out.getAs[String]("left_abv") === "9.2")
    assert(out.getAs[String]("right_abv") === "unknown")
    assert(out.getAs[String]("left_is_ale") === "true")
    assert(out.getAs[String]("right_is_amber") === "true")
    assert(out.getAs[String]("right_is_ale") === "false")
    // fill-missing (C4): fields absent from input still appear
    assert(out.getAs[String]("left_is_lager") === "false")
    assert(out.getAs[String]("left_special_ingredients") === "unknown")
  }

  test("dblacm: venue canonicalization, year extraction, VAL - rendering") {
    val df = Seq(
      (0, 1, "A Query Engine", "J. Doe,  M. Roe", "SIGMOD", "published 1999",
        "A Query  Engine", "J. Doe, M. Roe", "International Conference on Management of Data", "1999"),
      (1, 0, "Another Paper", "", "VLDB J.", "no year here",
        "Third Paper", "X. Y", "unknown venue", "2001"))
      .toDF("id", "label", "left_title", "left_authors", "left_venue", "left_year",
        "right_title", "right_authors", "right_venue", "right_year")
    val out = Enrichment.enrich(df, Enrichment.dblacm).collect()
    assert(out(0).getAs[String]("left_venue") === "SIGMOD Conference")
    assert(out(0).getAs[String]("right_venue") === "SIGMOD Conference")
    assert(out(0).getAs[String]("left_year") === "1999")
    assert(out(1).getAs[String]("left_venue") === "VLDB Journal")
    assert(out(1).getAs[String]("left_year") === "VAL -")
    assert(out(1).getAs[String]("left_authors") === "VAL -")
  }

  test("fodors: phone + address + city normalization") {
    val df = Seq((0, 1, "  the palm  ", "837 W. 5th St.", "la",
      "310/859-4818", "steakhouses", "0",
      "Palm The", "837 West 5th Street", "los angeles",
      "(310) 859 4818", "Steak House", "0"))
      .toDF("id", "label", "left_name", "left_addr", "left_city", "left_phone",
        "left_category", "left_class", "right_name", "right_addr", "right_city",
        "right_phone", "right_category", "right_class")
    val out = Enrichment.enrich(df, Enrichment.fodors).collect()(0)
    assert(out.getAs[String]("left_phone") === "310-859-4818")
    assert(out.getAs[String]("right_phone") === "310-859-4818")
    assert(out.getAs[String]("left_city") === "Los Angeles")
    assert(out.getAs[String]("left_addr").contains("Street"))
    assert(out.getAs[String]("left_category") === "steakhouses")
  }

  test("itunes: USD price, MM:SS time, ISO date, VAL - missing") {
    val df = Seq((0, 1, "Titanium", "David Guetta", "Nothing but the Beat",
      "Dance", "$1.29", "(C) 2011 EMI", "3:5", "26-Aug-11",
      "Titanium (feat. Sia)", "David Guetta", "Nothing But the Beat",
      "Dance, Music", "1.29", "2011 EMI", "4:05", "August 26, 2011"))
      .toDF("id", "label",
        "left_Song_Name", "left_Artist_Name", "left_Album_Name", "left_Genre",
        "left_Price", "left_CopyRight", "left_Time", "left_Released",
        "right_Song_Name", "right_Artist_Name", "right_Album_Name", "right_Genre",
        "right_Price", "right_CopyRight", "right_Time", "right_Released")
    val out = Enrichment.enrich(df, Enrichment.itunes).collect()(0)
    assert(out.getAs[String]("left_Price") === "USD 1.29")
    assert(out.getAs[String]("right_Price") === "USD 1.29")
    assert(out.getAs[String]("left_Time") === "03:05")
    assert(out.getAs[String]("left_Released") === "2011-08-26")
    assert(out.getAs[String]("right_Released") === "2011-08-26")
  }

  test("walmart: modelno charset preservation (R6)") {
    val df = Seq((0, 0, "HP Pavilion Laptop", "electronics/computers", "hewlett packard inc",
      "dv6-3225dx!", "$599", "Dell Laptop", "Computers", "Dell", "i15R-2646MRB", "649.99"))
      .toDF("id", "label", "left_title", "left_category", "left_brand",
        "left_modelno", "left_price", "right_title", "right_category",
        "right_brand", "right_modelno", "right_price")
    val out = Enrichment.enrich(df, Enrichment.walmart).collect()(0)
    assert(out.getAs[String]("left_brand") === "HP") // R4: Hewlett Packard→HP
    assert(out.getAs[String]("left_modelno") === "DV6-3225DX")
    assert(out.getAs[String]("right_modelno") === "I15R-2646MRB")
    assert(out.getAs[String]("left_price") === "599.00")
    assert(out.getAs[String]("left_category") === "electronics/computers")
  }

  test("wdc title: vendor noise + lang tags + units (byte-level)") {
    val df = Seq(
      (0, 1, "\"Corsair Vengeance 16GB\"@en | CDW.com", "Corsair Vengeance 16GB"),
      (1, 0, "Dell UltraSharp 27 27in Monitor SCAN UK", "LG 24 in monitor"))
      .toDF("id", "label", "left_title", "right_title")
    val out = Enrichment.enrich(df, Enrichment.wdcTitle).collect()
    assert(out(0).getAs[String]("left_title") === "Corsair Vengeance 16GB")
    assert(out(1).getAs[String]("left_title") === "Dell UltraSharp 27 27 inch Monitor")
    assert(out(1).getAs[String]("right_title") === "LG 24 inch monitor")
  }

  test("label-conditioned alignment (R14) only fires when enabled and label=1") {
    val df = Seq(
      (0, 1, "X", "Adobe", "9.99", "X", "", ""),
      (1, 0, "Y", "Adobe", "9.99", "Y", "", ""))
      .toDF("id", "label", "left_title", "left_manufacturer", "left_price",
        "right_title", "right_manufacturer", "right_price")
    val plain = Enrichment.enrich(df, Enrichment.amazon).collect()
    assert(plain(0).getAs[String]("right_price") === "unknown")
    val aligned = Enrichment.enrich(df,
      Enrichment.amazon.copy(alignMatches = true)).collect()
    // prices NEVER cross sides (Amazon/prompt.py:95), even when aligned
    assert(aligned(0).getAs[String]("right_price") === "unknown")
    assert(aligned(0).getAs[String]("right_manufacturer") === "Adobe") // copied
    assert(aligned(1).getAs[String]("right_price") === "unknown") // label=0
  }

  test("R14: version tokens graft onto the versionless side (matched only)") {
    val df = Seq(
      (0, 1, "Adobe Acrobat XI Professional", "Adobe", "n/a",
        "Adobe Acrobat", "Adobe", "n/a"),
      (1, 0, "Adobe Acrobat XI Professional", "Adobe", "n/a",
        "Adobe Acrobat", "Adobe", "n/a"),
      (2, 1, "Office 2007", "Microsoft", "n/a",
        "Office 2003", "Microsoft", "n/a"))
      .toDF("id", "label", "left_title", "left_manufacturer", "left_price",
        "right_title", "right_manufacturer", "right_price")
    val out = Enrichment.enrich(df, Enrichment.amazonAligned)
      .collect().map(r => r.getInt(0) -> r).toMap
    // matched + right has no version token -> "XI Professional" grafted
    assert(out(0).getAs[String]("right_title")
      === "Adobe Acrobat XI Professional")
    // non-match: no grafting
    assert(out(1).getAs[String]("right_title") === "Adobe Acrobat")
    // conflicting versions on both sides: untouched
    assert(out(2).getAs[String]("left_title") === "Office 2007")
    assert(out(2).getAs[String]("right_title") === "Office 2003")
  }

  test("R14: matched-pair aggressive cleanup (SKU, platform tags, trailers)") {
    val df = Seq(
      (0, 1, "Quicken Deluxe 19600061dm [Mac] Complete Package", "Intuit", "n/a",
        "Quicken Deluxe", "Intuit", "n/a"),
      (1, 0, "Quicken Deluxe 19600061dm [Mac] Complete Package", "Intuit", "n/a",
        "Quicken Deluxe", "Intuit", "n/a"))
      .toDF("id", "label", "left_title", "left_manufacturer", "left_price",
        "right_title", "right_manufacturer", "right_price")
    val out = Enrichment.enrich(df, Enrichment.amazonAligned)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getAs[String]("left_title") === "Quicken Deluxe")
    // label=0 keeps SKUs and platform tags (prompt-B semantics)
    assert(out(1).getAs[String]("left_title")
      === "Quicken Deluxe 19600061dm [Mac] Complete Package")
  }

  test("P5/P6: wide row splits to record structs and back; F12 enforces strings") {
    val df = Seq((0, 1, "A", "B", null.asInstanceOf[String], "D"))
      .toDF("id", "label", "left_title", "right_title", "left_brand", "right_brand")
    val rec = Enrichment.splitRecord(df, Seq("title", "brand"))
    assert(rec.columns.toSeq === Seq("id", "label", "left_record", "right_record"))
    val r0 = rec.collect()(0)
    assert(r0.getStruct(2).getAs[String]("title") === "A")
    assert(r0.getStruct(3).getAs[String]("brand") === "D")
    val back = Enrichment.unsplitRecord(rec, Seq("title", "brand"))
    assert(back.columns.toSeq ===
      Seq("id", "label", "left_title", "right_title", "left_brand", "right_brand"))
    assert(back.collect()(0).getAs[String]("left_brand") === null)
    val enforced = Enrichment.enforceStrings(back, Seq("left_brand", "id"))
    val e0 = enforced.collect()(0)
    assert(e0.getAs[String]("left_brand") === "")   // str(x or "")
    assert(e0.getAs[String]("id") === "0")
  }

  test("camera: golden rows lifted from camers/train.csv (R3 camera rows + brands)") {
    // literal left/right titles from /root/reference/DeepMather/camers/
    // train.csv rows 53, 75, 69, 190 — the USM/SLR/EF-S expansions and
    // GOPRO/"Go Pro" brand variants named in camers/single.py:60-66
    val df = Seq(
      (0, 0,
        "Canon EF-S 10-22mm USM  Canon USM Ultra-wide-angle zoom lens for APS-C sensor EOS SLR cameras at Crutchfield.com",
        "Canon EOS Rebel T3 Digital SLR Camera with EF-S 18-55mm f/3.5-5.6 IS Lens (discontinued by manufacturer) Digital Cameras | Ultimate Shop"),
      (1, 0,
        "SOPORTE LATERAL GOPRO SIDE MOUNT",
        "Tripod Adaptor Go Pro Tripod Adaptor - Accessories Video Cameras Electronic & Orienteering Devices at Barrabes.com"))
      .toDF("id", "label", "left_title", "right_title")
    val out = Enrichment.enrich(df, Enrichment.wdcCamera).collect()
    assert(out(0).getAs[String]("left_title") ===
      "Canon EF-S Mount 10-22mm Ultrasonic Motor Canon Ultrasonic Motor " +
        "Ultra-wide-angle zoom lens for APS-C sensor EOS Single Lens Reflex " +
        "cameras at Crutchfield.com")
    val r0 = out(0).getAs[String]("right_title")
    assert(r0.contains("Digital Single Lens Reflex Camera") &&
      r0.contains("EF-S Mount 18-55mm"), r0)
    assert(out(1).getAs[String]("left_title") ===
      "SOPORTE LATERAL GoPro SIDE MOUNT")
    assert(out(1).getAs[String]("right_title").startsWith(
      "Tripod Adaptor GoPro Tripod Adaptor"), out(1).getAs[String]("right_title"))
    // idempotent: enriching the enriched output is a fixed point
    val once = Enrichment.enrich(df, Enrichment.wdcCamera)
    val twice = Enrichment.enrich(once, Enrichment.wdcCamera)
    assert(once.collect().toSeq === twice.collect().toSeq)
  }

  test("wdcTitleAligned: matched pairs unit-unify + cross-copy; part codes survive") {
    val l = "WD 2TB 7200 RPM 3.5 inch WD20EFRX"
    val r = "WD 2 TB 7200RPM 3.5in WD20EFRX"
    val df = Seq(
      (0, 1, l, r),                        // matched: must converge
      (1, 0, l, r),                        // unmatched: light normalization
      (2, 1, l, null.asInstanceOf[String]), // matched + missing: cross-copy
      (3, 0, l, null.asInstanceOf[String])) // unmatched + missing: unknown
      .toDF("id", "label", "left_title", "right_title")
    val out = Enrichment.enrich(df, Enrichment.wdcTitleAligned)
      .orderBy("id").collect()
    val unified = "WD 2TB 7200RPM 3.5in WD20EFRX"
    assert(out(0).getAs[String]("left_title") === unified)
    assert(out(0).getAs[String]("right_title") === unified)
    // label=0 keeps the base (expanded-unit) normalization, sides differ
    assert(out(1).getAs[String]("left_title") === "WD 2TB 7200 RPM 3.5 inch WD20EFRX")
    assert(out(1).getAs[String]("right_title") === "WD 2 TB 7200RPM 3.5 inch WD20EFRX")
    // R14a cross-copy only for matched pairs
    assert(out(2).getAs[String]("right_title") === unified)
    assert(out(3).getAs[String]("right_title") === "unknown")
    // procs.py:62: part codes never removed or altered
    out.foreach(r0 => assert(
      r0.getAs[String]("left_title").contains("WD20EFRX"), r0.toString))
  }

  test("R4: brand canonicalization via broadcast dim join") {
    val df = Seq((0, "hewlett packard corp"), (1, "Google LLC"), (2, "NoName"))
      .toDF("id", "brand")
    val dim = Seq(("hewlett packard", "HP"), ("google", "Google"))
      .toDF("variant", "canonical")
    val out = Enrichment.canonicalizeBrandJoin(df, "brand", dim)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("brand") === "HP")
    assert(out(1).getAs[String]("brand") === "Google")
    assert(out(2).getAs[String]("brand") === "Noname") // fallback Title Case
    val plan = Enrichment.canonicalizeBrandJoin(df, "brand", dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}

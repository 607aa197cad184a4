package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic synthetic Common-Crawl-style page corpus with planted
 * entity clusters (BASELINE.json input_hint schema:
 * pages(url, warc_ts, html, text, lang)).
 *
 * Fully distributed and seed-deterministic: every attribute derives from
 * `xxhash64(seed, entity, variant, tag)` column expressions — no driver
 * loops, no RNG state, identical output at any parallelism level
 * (SURVEY.md §7.5 risk 6). Scales linearly: `spark.range` → narrow maps.
 *
 * The planted noise mirrors the reference corpora's observed artifacts
 * (vendor suffixes, `"…"@en` lang tags, unit-spacing variants, duplicated
 * words, case jitter — cf. /root/reference/DeepMather/computer/train.csv:2-4,
 * camers/train.csv:2-3).
 */
object PageGen {

  private val brands = Seq("Acer", "Lenovo", "Dell", "Asus", "HP", "Apple",
    "Toshiba", "Samsung", "MSI", "Fujitsu")
  private val series = Seq("Aspire", "ThinkPad", "Latitude", "ZenBook",
    "Pavilion", "MacBook", "Satellite", "Galaxy Book", "Prestige", "LifeBook")
  private val vendors = Seq("cdw.com", "scan.co.uk", "tweakers.net",
    "newegg.com", "bestbuy.com", "alternate.de")
  private val vendorTags = Seq(" | CDW.com", " SCAN UK", " @Tweakers",
    " - Newegg.com", " Best Buy", " (Alternate)")
  private val sizes = Seq("13.3", "14", "15.6", "17.3")
  private val langs = Seq("en", "en", "en", "nl", "fr") // en-skewed

  private def arrCol(xs: Seq[String]): Column = array(xs.map(lit): _*)

  /** Deterministic hash stream: h(seed, parts...) >= 0. */
  private def h(seed: Long, parts: Column*): Column =
    abs(xxhash64((lit(seed) +: parts): _*))

  private def pick(xs: Seq[String], hash: Column): Column =
    element_at(arrCol(xs), (pmod(hash, lit(xs.size)) + 1).cast(IntegerType))

  /** Ground-truth page table. Columns: url, warc_ts, html, text, lang,
    * entity_id (drop `entity_id` to get the pipeline input). */
  def pagesWithTruth(spark: SparkSession, nEntities: Long, seed: Long = 42L)
      : DataFrame = {
    import spark.implicits._
    val ent = spark.range(nEntities).toDF("entity_id")
      .withColumn("brand", pick(brands, h(seed, $"entity_id", lit("b"))))
      .withColumn("series", pick(series, h(seed, $"entity_id", lit("s"))))
      .withColumn("modelno",
        concat(upper(substring($"brand", 1, 1)),
          (pmod(h(seed, $"entity_id", lit("m")), lit(9000L)) + 1000).cast(StringType),
          pick(Seq("X", "T", "G", "U", "P"), h(seed, $"entity_id", lit("l")))))
      .withColumn("size_in", pick(sizes, h(seed, $"entity_id", lit("z"))))
      .withColumn("ram", pick(Seq("8GB", "16GB", "32GB", "64GB", "4GB", "12GB"),
        h(seed, $"entity_id", lit("r"))))
      .withColumn("cpu", pick(Seq("i5-8250U", "i7-9750H", "i3-1005G1",
        "Ryzen5-3500U", "Ryzen7-4800H", "i9-13900H", "i7-1165G7",
        "Celeron-N4020"), h(seed, $"entity_id", lit("c"))))
      .withColumn("title0",
        concat_ws(" ", $"brand", $"series", $"modelno", $"cpu", $"ram",
          concat($"size_in", lit(" inch")), lit("Laptop")))
      .withColumn("n_pages", (pmod(h(seed, $"entity_id", lit("n")), lit(3L)) + 2)
        .cast(IntegerType))

    val pages = ent
      .withColumn("variant", explode(sequence(lit(0), $"n_pages" - 1)))
      .withColumn("vh", h(seed, $"entity_id", $"variant", lit("v")))
      .withColumn("vendor_idx", pmod($"vh", lit(vendors.size)).cast(IntegerType))
      .withColumn("host", element_at(arrCol(vendors), $"vendor_idx" + 1))
      .withColumn("url", concat(lit("https://"), $"host", lit("/p/"),
        lower(hex(h(seed, $"entity_id", $"variant", lit("u"))))))
      .withColumn("lang", pick(langs, h(seed, $"entity_id", $"variant", lit("g"))))
      // --- noise channel (deterministic per variant; variant 0 is clean) --
      .withColumn("nz", when($"variant" === 0, lit(0L))
        .otherwise(h(seed, $"entity_id", $"variant", lit("x"))))
      .withColumn("t1", when(pmod($"nz", lit(2)) === 1,
          concat($"title0", element_at(arrCol(vendorTags), $"vendor_idx" + 1)))
        .otherwise($"title0"))
      .withColumn("t2", when(pmod($"nz", lit(4)) >= 2,
          regexp_replace($"t1", " inch", "in")).otherwise($"t1"))
      .withColumn("t3", when(pmod($"nz", lit(8)) >= 4,
          regexp_replace($"t2", "^(\\S+)", "$1 $1")).otherwise($"t2"))
      .withColumn("t4", when(pmod($"nz", lit(16)) >= 8, lower($"t3")).otherwise($"t3"))
      .withColumn("noisy_title", when(pmod($"nz", lit(32)) >= 16,
          concat(lit("\""), $"t4", lit("\"@"),
            when($"lang" === "en", lit("en"))
              .when($"lang" === "nl", lit("NL")).otherwise(lit("fr"))))
        .otherwise($"t4"))
      .withColumn("text", concat(lit("COL title VAL "), $"noisy_title",
        lit(" COL brand VAL "), $"brand"))
      .withColumn("html", to_binary(concat(
        lit("<html><head><title>"), $"noisy_title",
        lit("</title></head><body><h1>"), $"noisy_title",
        lit("</h1></body></html>")), lit("utf-8")))
      .withColumn("warc_ts", timestamp_seconds(
        lit(1700000000L) + pmod(h(seed, $"entity_id", $"variant", lit("t")),
          lit(86400L * 365))))

    pages.select($"url", $"warc_ts", $"html", $"text", $"lang",
      $"entity_id", $"brand", $"host")
  }

  /** Pipeline input view (input_hint schema only). */
  def pages(spark: SparkSession, nEntities: Long, seed: Long = 42L): DataFrame =
    pagesWithTruth(spark, nEntities, seed)
      .select("url", "warc_ts", "html", "text", "lang")

  /** Labeled pairs at shared blocking keys (BASELINE.md target input):
    * positives = same entity; negatives = same brand (the shared block),
    * different entity, subsampled ~1:3 pos:neg deterministically. */
  def labeledPairs(spark: SparkSession, nEntities: Long, seed: Long = 42L)
      : DataFrame = {
    import spark.implicits._
    val t = pagesWithTruth(spark, nEntities, seed)
      .select($"url", $"entity_id", $"brand")
    val l = t.toDF("left_url", "l_ent", "l_brand")
    val r = t.toDF("right_url", "r_ent", "r_brand")
    l.join(r, $"l_brand" === $"r_brand" && $"left_url" < $"right_url")
      .withColumn("label", when($"l_ent" === $"r_ent", 1).otherwise(0))
      .withColumn("keep", $"label" === 1 ||
        pmod(abs(xxhash64($"left_url", $"right_url")), lit(100L)) < 2)
      .where($"keep")
      .select($"left_url", $"right_url", lower($"l_brand").as("block_key"),
        $"label")
  }
}

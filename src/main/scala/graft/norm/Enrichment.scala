package graft.norm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.GraftFunctions._

/**
 * The enrichment operator (SURVEY.md §2.5 M1/M2): one parameterized,
 * fully deterministic transform that replaces the reference's 12
 * per-dataset LLM scripts. A dataset config = closed output schema +
 * per-field rule chain + missing-value rendering; the whole enrichment is
 * a single `select` over the wide pair table (no shuffle, codegen'd).
 *
 * The reference's label-conditioned alignment (R14: matched pairs get
 * cross-side value copying — Amazon/prompt.py:64-109 vs :111-148) is
 * behind `alignMatches` and never applied unless explicitly requested
 * (it leaks the label into features; SURVEY.md §7.5 risk 2).
 */
object Enrichment {

  /** Missing-value rendering per dataset ("unknown" vs "VAL -"). */
  final case class DatasetConfig(
      name: String,
      fields: Seq[String],                    // closed output schema (per side)
      rules: Map[String, Column => Column],   // field → normalizer
      missing: String = "unknown",
      sources: Map[String, String] = Map.empty,    // field → input column (C3)
      alignMatches: Boolean = false)

  /** Generic text cleanup used for name-ish fields: strip artifacts,
    * collapse whitespace, dedupe repeated words (R2), Title Case (R1). */
  def cleanEntityName(c: Column): Column =
    initcap(wsCollapse(dedupeWords(regexp_replace(c, "[\\\\`]|\"", ""))))

  /** Same cleanup but preserving original casing (titles keep versions). */
  def cleanText(c: Column): Column =
    wsCollapse(dedupeWords(regexp_replace(c, "[\\\\`]", "")))

  private def renderOr(c: Column, missing: String): Column =
    coalesce(c, lit(missing))

  /** Apply a config to a wide pair table (id, label, left_*, right_*).
    * Output schema: id, label, left_<f>, right_<f> for f in cfg.fields —
    * closed (C5's open-schema leak is intentionally NOT reproduced). */
  def enrich(df: DataFrame, cfg: DatasetConfig): DataFrame = {
    def inputCol(side: String, f: String): Column = {
      val base = cfg.sources.getOrElse(f, f)
      val candidates = Seq(s"${side}_$base", s"${side}_$f")
      candidates.find(df.columns.contains) match {
        case Some(name) => col(name).cast(StringType)
        case None => lit(null).cast(StringType)
      }
    }
    val sideCols = cfg.fields.flatMap { f =>
      val rule = cfg.rules.getOrElse(f, (c: Column) => cleanText(c))
      def out(side: String): Column = {
        val raw = inputCol(side, f)
        val normalized = rule(nullMarkers(raw))
        val other = rule(nullMarkers(inputCol(if (side == "left") "right" else "left", f)))
        val aligned =
          if (cfg.alignMatches)
            when(col("label") === 1 && normalized.isNull, other)
              .otherwise(normalized)
          else normalized
        renderOr(aligned, cfg.missing).as(s"${side}_$f")
      }
      Seq(out("left"), out("right"))
    }
    df.select((col("id") +: col("label") +: sideCols): _*)
  }

  // ---------------- per-dataset configs (FIXTURES.md §4) -----------------

  /** Amazon software (Amazon/prompt.py:11-15, 23-39). */
  val amazon = DatasetConfig(
    name = "amazon",
    fields = Seq("title", "manufacturer", "price"),
    rules = Map(
      "title" -> (c => Normalize.stripVendorNoise(
        Normalize.expandAbbreviations(cleanText(c)))),
      "manufacturer" -> (c => cleanEntityName(Normalize.dropCorpSuffixes(c))),
      "price" -> (c => when(priceParse(c).isNull, lit(null))
        .otherwise(format_string("%.2f", priceParse(c))))))

  /** Beer (Beer/prompt.py:10-21, 30-63; Beer/process.py:30-51, 86-116). */
  val beer = DatasetConfig(
    name = "beer",
    fields = Seq("name", "brewery", "primary_style", "secondary_style",
      "abv", "is_amber", "is_ale", "is_lager", "is_imperial",
      "special_ingredients"),
    sources = Map("name" -> "Beer_Name", "brewery" -> "Brew_Factory_Name",
      "primary_style" -> "Style", "secondary_style" -> "Style",
      "abv" -> "ABV"),
    rules = Map(
      "name" -> (c => cleanEntityName(c)),
      "brewery" -> (c => cleanEntityName(Normalize.dropCorpSuffixes(c))),
      // R7: "American Amber / Red Ale" → primary=Red Ale (most specific =
      // last segment), secondary = first qualifier
      "primary_style" -> (c =>
        initcap(trim(element_at(split(c, "/"), -1)))),
      "secondary_style" -> (c =>
        when(size(split(c, "/")) > 1,
          initcap(trim(regexp_replace(element_at(split(c, "/"), 1),
            "(?i)\\bamerican\\b", "")))).otherwise(lit(null))),
      "abv" -> (c => when(abvParse(c).isNull, lit(null))
        .otherwise(abvParse(c).cast(StringType))),
      "is_amber" -> (c => boolCoerce(c).cast(StringType)),
      "is_ale" -> (c => boolCoerce(c).cast(StringType)),
      "is_lager" -> (c => boolCoerce(c).cast(StringType)),
      "is_imperial" -> (c => boolCoerce(c).cast(StringType)),
      "special_ingredients" -> (c => lower(cleanText(c)))))

  /** DBLP-ACM (DBLACM/prompt.py:10-15, 41-42, 55-70). */
  val dblacm = DatasetConfig(
    name = "dblacm",
    fields = Seq("title", "authors", "venue", "year"),
    missing = "VAL -",
    rules = Map(
      "title" -> (c => cleanText(c)),
      "authors" -> (c => wsCollapse(c)),
      "venue" -> (c => Normalize.venueCanon(c)),
      "year" -> (c => nullif(yearExtract(c), lit("")))))

  /** Fodors-Zagats (Fodors/prompt.py:10-17, 40-58). */
  val fodors = DatasetConfig(
    name = "fodors",
    fields = Seq("name", "addr", "city", "phone", "category", "class"),
    rules = Map(
      "name" -> (c => cleanEntityName(c)),
      "addr" -> (c => initcap(wsCollapse(Normalize.expandAbbreviations(c)))),
      "city" -> (c => {
        val t = lower(trim(c))
        when(t.isin("la", "l.a."), "Los Angeles")
          .when(t.isin("nyc", "new york"), "New York City")
          .otherwise(initcap(wsCollapse(c)))
      }),
      "phone" -> (c => phoneUs(c)),
      "category" -> (c => lower(wsCollapse(c))),
      "class" -> (c => trim(c))))

  /** iTunes-Amazon (iTunes/prompt.py:10-20; iTunes/process.py:84-125). */
  val itunes = DatasetConfig(
    name = "itunes",
    fields = Seq("Song_Name", "Artist_Name", "Album_Name", "Genre", "Price",
      "CopyRight", "Time", "Released"),
    missing = "VAL -",
    rules = Map(
      "Song_Name" -> (c => cleanText(c)),
      "Artist_Name" -> (c => wsCollapse(c)),
      "Album_Name" -> (c => cleanText(c)),
      "Genre" -> (c => wsCollapse(c)),
      "Price" -> (c => priceUsd(c)),
      "CopyRight" -> (c => wsCollapse(c)),
      "Time" -> (c => timeNormalize(c)),
      "Released" -> (c => dateNormalize(c))))

  /** Walmart-Amazon (walmart/prompt.py:12, 20-38, 85). */
  val walmart = DatasetConfig(
    name = "walmart",
    fields = Seq("title", "category", "brand", "modelno", "price"),
    rules = Map(
      "title" -> (c => Normalize.stripVendorNoise(cleanText(c))),
      "category" -> (c => lower(wsCollapse(c))),
      "brand" -> (c => cleanEntityName(Normalize.dropCorpSuffixes(c))),
      // R6: model numbers upper-case, restricted charset A-Z0-9-._/
      "modelno" -> (c => nullif(
        regexp_replace(upper(trim(c)), "[^A-Z0-9\\-._/]", ""), lit(""))),
      "price" -> (c => when(priceParse(c).isNull, lit(null))
        .otherwise(format_string("%.2f", priceParse(c))))))

  /** WDC cameras / computers (camers|computer/single.py:10-12, 43-71). */
  val wdcTitle = DatasetConfig(
    name = "wdc_title",
    fields = Seq("title"),
    rules = Map(
      "title" -> (c => Normalize.unitSpacing(
        Normalize.stripVendorNoise(Normalize.stripLangTags(cleanText(c)))))))

  val all: Seq[DatasetConfig] =
    Seq(amazon, beer, dblacm, fodors, itunes, walmart, wdcTitle)
}

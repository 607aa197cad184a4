package graft.norm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * R15: field back-filling from free text (iTunes/process.py:84-125) — a
 * regexp-extract cascade over the raw Song_Name column that populates
 * missing Price / Time / Released / Genre fields when the information is
 * unambiguously embedded in the title text. Pure column expressions.
 */
object Backfill {

  /** First $-price or bare x.yy price in the text, rendered "USD X.XX". */
  def priceFromText(text: Column): Column = {
    val m = regexp_extract(text, "(?:USD\\s*|\\$)\\s*([0-9]+\\.[0-9]{2})\\b", 1)
    when(m =!= "", concat(lit("USD "), m)).otherwise(lit(null))
  }

  /** First mm:ss duration token, zero-padded. Seconds must be two digits
    * (every reference duration is — iTunes prompt examples 3:29, 4:02,
    * 05:30): a {1,2} seconds group would also match aspect ratios like
    * "16:9" and back-fill bogus durations. Single-digit MINUTES are fine
    * ("3:05"); timeNormalize pads them. */
  def timeFromText(text: Column): Column = {
    val m = regexp_extract(text, "\\b([0-9]{1,2}):([0-9]{2})\\b", 0)
    when(m =!= "", timeNormalize(m)).otherwise(lit(null))
  }

  /** First recognizable date expression → yyyy-MM-dd. */
  def dateFromText(text: Column): Column = {
    val patterns = Seq(
      "\\b[0-9]{1,2}-[A-Za-z]{3}-[0-9]{2}\\b",           // 26-Aug-11
      "\\b[A-Za-z]{3,9} [0-9]{1,2}, [0-9]{4}\\b",        // May 18, 2015
      "\\b[0-9]{4}-[0-9]{2}-[0-9]{2}\\b")                // ISO
    val hit = coalesce(patterns.map(p =>
      nullif(regexp_extract(text, p, 0), lit(""))): _*)
    dateNormalize(hit)
  }

  private val genreWords = Seq("Dance", "Electronic", "Country", "Hip-Hop",
    "Rock", "Pop", "Jazz", "Classical", "R&B", "Soul", "Latin", "Reggae")

  /** Comma-joined genre-vocabulary words found in the text (order of
    * appearance approximated by vocabulary order — deterministic). */
  def genreFromText(text: Column): Column = {
    val found = genreWords.map(g =>
      when(text.rlike("\\b" + java.util.regex.Pattern.quote(g) + "\\b"), g))
    val arr = filter(array(found: _*), c => c.isNotNull)
    when(size(arr) > 0, concat_ws(", ", arr)).otherwise(lit(null))
  }

  /** Apply the cascade to a wide iTunes pair table: for each side, fill
    * Price/Time/Released/Genre from Song_Name when missing. Run BEFORE
    * Enrichment.enrich (operates on raw columns). */
  def itunes(df: DataFrame): DataFrame = {
    Seq("left", "right").foldLeft(df) { (acc, side) =>
      val song = col(s"${side}_Song_Name")
      def fill(field: String, extractor: Column => Column): DataFrame => DataFrame =
        d => if (!d.columns.contains(s"${side}_$field")) d
        else d.withColumn(s"${side}_$field",
          coalesce(nullMarkers(col(s"${side}_$field")), extractor(song)))
      Seq(
        fill("Price", priceFromText _),
        fill("Time", timeFromText _),
        fill("Released", dateFromText _),
        fill("Genre", genreFromText _)
      ).foldLeft(acc)((d, f) => f(d))
    }
  }
}

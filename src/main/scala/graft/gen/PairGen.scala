package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * Deterministic dirty wide-pair fixtures for the per-dataset enrichment
 * oracles: one row per labeled pair in the reference's own layout
 * (id, label, left_<f>, right_<f> — Beer/process.py:183-196 new_row).
 * Every field draws from a small pool of planted dirty values chosen to
 * exercise each normalization-rule branch (null markers, escape
 * artifacts, repeated words, abbreviations, unit/phone/date/price
 * formats). Pure column expressions — no RNG, no driver loops — so both
 * engines stage identical bytes and the fixture is sf-independent.
 *
 * Pool indexing: value = pool[(id * prime_f + shift) % |pool|] with a
 * per-field prime ≥ 11 (coprime to every pool size used here), so every
 * pool value occurs on both sides and all pool pairings appear as id
 * varies. label = 1 iff id % 3 == 0 (the aligned configs need a healthy
 * matched slice).
 */
object PairGen {

  private val primes =
    Seq(11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71)

  private def pick(pool: Seq[String], idx: Column): Column = {
    val arr = array(pool.map(v =>
      if (v == null) lit(null).cast(StringType) else lit(v)): _*)
    element_at(arr, pmod(idx, lit(pool.size)).cast(IntegerType) + 1)
  }

  /** Wide pair table over the given field pools. */
  def widePairs(spark: SparkSession, n: Int,
      fields: Seq[(String, Seq[String])]): DataFrame = {
    require(fields.size <= primes.size, "add primes for more fields")
    fields.zipWithIndex.foreach { case ((name, pool), i) =>
      require(pool.size % primes(i) != 0,
        s"pool size ${pool.size} for $name is a multiple of prime " +
          s"${primes(i)} — the stride would degenerate to one value")
    }
    val base = spark.range(n.toLong).select(col("id"),
      (pmod(col("id"), lit(3)) === 0).cast(IntegerType).as("label"))
    fields.zipWithIndex.foldLeft(base) { case (df, ((name, pool), i)) =>
      val p = primes(i)
      df.withColumn(s"left_$name", pick(pool, col("id") * p + lit(i)))
        .withColumn(s"right_$name", pick(pool, col("id") * p + lit(7 * i + 3)))
    }
  }

  /** Beer (Beer/process.py:11-22 schema; rules Beer/prompt.py:30-63). */
  def beerPairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "Beer_Name" -> Seq(
        "hoppy trail trail ipa", "Dark\\Star `Stout`", "N/A",
        "golden GOLDEN lager", "  ol' rasputin   imperial stout ",
        "Sculpin IPA", "90 minute ipa", null, "\"Heady Topper\"", "-"),
      "Brew_Factory_Name" -> Seq(
        "stone brewing co.", "Founders Brewing Co. Inc.", "sierra   nevada",
        "null", "Allagash Brewing Company", "Dogfish Head Ltd",
        "bell's brewery llc", null),
      "Style" -> Seq(
        "American Amber / Red Ale", "American Double / Imperial IPA",
        "India Pale Ale", "lager", "-", "American Porter",
        "Belgian Strong / Dark Ale", "witbier", null),
      "ABV" -> Seq(
        "5.60%", "8%", "unknown", "4.2", "-", "6.66%", "12 %", null,
        "N/A", "7.1% ABV"),
      "is_amber" -> Seq("true", "True", "yes", "no", "0", "1", "FALSE",
        "", null, "2"),
      "is_ale" -> Seq("yes", "no", "true", "false", "1", "0", "", null),
      "is_lager" -> Seq("false", "no", "0", "true", "YES", "", null, "0.0"),
      "is_imperial" -> Seq("no", "false", "TRUE", "1", "", null, "yes", "0"),
      "special_ingredients" -> Seq(
        "Coriander & Orange Peel", "none", "RASPBERRY raspberry puree",
        "oats, honey", null, "vanilla `beans`", "COFFEE", "-")))

  /** DBLP-ACM (DBLACM/prompt.py:10-15, 55-70). */
  def dblacmPairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "title" -> Seq(
        "Efficient  query evaluation", "A \\`Survey` of of Data Models",
        "-", null, "Query Optimization optimization Techniques",
        "On the Semantics of Updates", "\"Mining Association Rules\"",
        "the THE complexity of joins"),
      "authors" -> Seq(
        "A.  Gupta,  B.   Jagadish ", "John   Smith", null, "",
        "C. Mohan", "  E. F. Codd", "D. DeWitt, J. Gray", "-"),
      "venue" -> Seq(
        "SIGMOD Conference", "sigmod", "ACM SIGMOD Record",
        "International Conference on Management of Data", "sigmod record",
        "vldb j.", "The VLDB Journal", "Very Large Data Bases", "VLDB",
        "ICDE", null, " vldb conference "),
      "year" -> Seq(
        "1998", "2003.0", "null", "", "circa 1999", "87", null, "2011")))

  /** Fodors-Zagats (Fodors/prompt.py:10-17, 40-58). */
  def fodorsPairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "name" -> Seq(
        "ritz-carlton cafe (buckhead)", "CAFE  ritz  RITZ", null,
        "lespinasse", "Second Ave.  Deli", "-", "\"21\" club",
        "patina  patina"),
      "addr" -> Seq(
        "605 Third Ave.", "386 w. broadway Blvd.", "210 Main St.",
        "1 Rodeo Rd.", "112 fifth avenue", null, "-",
        "386 Park Ave. South", "8 Mott St.  Suite 2"),
      "city" -> Seq(
        "LA", "l.a.", "nyc", "new york", "los angeles", "chicago",
        "new york city", null, "-", " atlanta "),
      "phone" -> Seq(
        "212/586-7714", "(310) 246-1501", "1-212-555-0199", "555-1234",
        "unknown", null, "310.246.1501 ext 22", "212 757 2245"),
      "category" -> Seq(
        "Coffee Shops/Diners", "FRENCH  bistro", "italian", null,
        "Hot Dogs", "american (new)", "-", "BBQ"),
      "class" -> Seq(" 5 ", "12", "0", null, "3", "-", "117", "620")))

  /** iTunes-Amazon (iTunes/process.py:11-20, 84-125). */
  def itunesPairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "Song_Name" -> Seq(
        "Illusion (feat. Echosmith)", "Titanium (Spanish Version)",
        "Still Down [Explicit]", "Blank   Space space", null, "-",
        "Take Me  Home", "\"Shake It Off\""),
      "Artist_Name" -> Seq(
        "Zedd", "David Guetta & Sia", "  Taylor   Swift ", null, "",
        "Kendrick   Lamar", "-", "Echosmith"),
      "Album_Name" -> Seq(
        "Listen (Deluxe Version)", "True Colors", "1989  1989", null,
        "-", "good kid,  m.A.A.d city", "x  (Wembley Edition)", ""),
      "Genre" -> Seq(
        "Dance,  Music,   Electronic", "Hip-Hop/Rap", "Country", null,
        "", "Pop", "-", "Rock,  Music"),
      "Price" -> Seq(
        "$1.29", "1.29", "USD 0.99", "Album Only", "$0.69", null, "-",
        "1,299.00"),
      "CopyRight" -> Seq(
        "(C) 2014 Atlantic  Recording Corporation",
        "2015 Interscope Records", null, "", "-",
        "(P) 2012 Aftermath Records", "2013  Big Machine Records, LLC",
        "compilation (P) 2014 Interscope"),
      "Time" -> Seq(
        "3:5", "4:02", "05:30", "1:23:45", null, "240", "12:3", "0:59"),
      "Released" -> Seq(
        "26-Aug-11", "May 18, 2015", "2013-01-01", "9/12/2014",
        "5 July 2013", "unknown", null, "5-Jul-25", "TBD")))

  /** WDC camera titles (camers/single.py:43-67; dirty variants lifted
    * from the shapes in camers/train.csv). */
  def cameraPairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "title" -> Seq(
        "canon eos 80d digital slr camera w/ 18-135mm usm lens best buy",
        "go pro hero3+ silver edition @tweakers",
        "GOPRO hero4 session scan uk",
        "Sigma 8-16mm f/4.5-5.6 DC HSM ultra-wide lens for nikon@en",
        "canon ef-s 18-55mm is ii lens (alternate)",
        "nikon d3300 dslr 24.2 mp | ebay",
        "panasonic lumix 14.2 in display black friday 2017 deals",
        "sony alpha a6000 single lens reflex kit",
        null, "-",
        "Canon EF 70-300mm f/4-5.6 IS II USM Telephoto Zoom   Lens",
        "olympus om-d e-m10 mark II ii kit")))

  /** Computer titles for the aligned (match-sensitive) config
    * (computer/procs.py:57-85): unit-format variants that must converge
    * on matched pairs, part codes that must survive untouched. */
  def alignedTitlePairs(spark: SparkSession, n: Int = 150): DataFrame =
    widePairs(spark, n, Seq(
      "title" -> Seq(
        "seagate barracuda 2tb 7200 rpm 3.5 inch sata drive st2000dm008",
        "seagate barracuda 2 tb 7200rpm 3.5in sata drive st2000dm008",
        "corsair vengeance 16 gb ddr4 2666 mhz cmk16gx4m2b2666c16",
        "wd red 4tb 5400 rpm nas drive wd40efrx",
        null, "-",
        "samsung 850 evo 1tb 2.5 inch ssd mz-75e1t0b",
        "intel 540s 240 gb sata ssd ssdsckkw240h6x1 cdw.com extra",
        "hp proliant 658071-b21 500 gb 7200 RPM drive")))
}

package graft.norm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/**
 * Deterministic normalization-rule library (SURVEY.md §2.4 R1-R15): the
 * *specified semantics* of the reference's enrichment prompts and coercion
 * code, re-expressed as pure Catalyst column transforms (the rebuild
 * replaces the reference's temperature-0 LLM loop with these — SURVEY.md
 * §3.2). Each rule is a `Column => Column`, composable per dataset.
 */
object Normalize {

  /** R5: vendor/marketing noise removal — site suffixes and trailer tags
    * seen in the WDC corpora (camers/single.py:43-46, computer/single.py:44,
    * computer/procs.py:60-63). Case-insensitive, anchored at end.
    *
    * Two pattern families, applied in order (the SQL oracle twin
    * `SparkEntry.sqlVendorNoise` is generated from these same lists, so
    * Scala and DuckDB cannot drift):
    *  - EATERS consume from their match point to end-of-string (site
    *    suffix plus whatever trails it);
    *  - TAGS are finite trailers. Web titles STACK them ("X scan uk
    *    @tweakers"), so they strip as a repeated group in one pass —
    *    per-pattern anchored replaces would leave the inner tag behind
    *    and make normalization non-idempotent (caught by PropertiesSpec). */
  val vendorNoiseEaters: Seq[String] = Seq(
    "\\s*\\|\\s*cdw\\.com.*$", "\\s*-\\s*newegg\\.com.*$",
    "\\s+black\\s+friday.*$")
  val vendorNoiseTags: Seq[String] = Seq(
    "\\s+scan\\s+uk", "\\s*@tweakers", "\\s+best\\s+buy",
    "\\s*\\(alternate\\)", "\\s*\\|\\s*ebay")
  val vendorNoiseStacked: String =
    "(?:" + vendorNoiseTags.mkString("|") + ")+\\s*$"

  def stripVendorNoise(c: Column): Column =
    regexp_replace(
      vendorNoiseEaters.foldLeft(c)((acc, p) =>
        regexp_replace(acc, "(?i)" + p, "")),
      "(?i)" + vendorNoiseStacked, "")

  /** Lang-tag + quote strip (computer.py:54 semantics, generalized to any
    * `@xx` tag at end-of-value). */
  def stripLangTags(c: Column): Column =
    regexp_replace(regexp_replace(c, "\"", ""), "@[A-Za-z]{2}\\b", "")

  /** Unit-spacing canonicalization: "15.6in"/"15.6 in" → "15.6 inch"
    * (unit variants planted per FIXTURES.md §1 / camers corpus). */
  def unitSpacing(c: Column): Column =
    regexp_replace(c, "(?i)(\\d(?:\\.\\d+)?)\\s*(?:inch|in)\\b", "$1 inch")

  /** R2: collapse consecutive duplicate words (case-insensitive). */
  def dedupeConsecutiveWords(c: Column): Column = dedupeWords(c)

  /** R3: abbreviation expansion table (Amazon/prompt.py:84-87,
    * Fodors/prompt.py:56, Beer/process.py:77-79). Word-boundary replaces. */
  val abbreviations: Seq[(String, String)] = Seq(
    "\\bCS1\\b" -> "Creative Suite 1", "\\bCS2\\b" -> "Creative Suite 2",
    "\\bCS3\\b" -> "Creative Suite 3", "\\bCAL\\b" -> "Client Access License",
    "\\bSvr\\b" -> "Server", "\\bUpg\\b" -> "Upgrade",
    "\\bS/W\\b" -> "Software", "\\bWin\\b" -> "Windows",
    "\\bPropack\\b" -> "Pro Pack", "\\bAV\\b" -> "Anti-Virus",
    "\\bCo\\.(?=\\s|$)" -> "Company", "\\bSt\\.(?=\\s|$)" -> "Street",
    "\\bAve\\.(?=\\s|$)" -> "Avenue", "\\bRd\\.(?=\\s|$)" -> "Road",
    "\\bBlvd\\.(?=\\s|$)" -> "Boulevard")

  def expandAbbreviations(c: Column): Column =
    abbreviations.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  // ---------------- camera-domain rows (camers/single.py:55-67) ----------

  /** R3 camera rows ("USM"→"Ultrasonic Motor", "SLR"→"Single Lens
    * Reflex", "EF-S"→"EF-S Mount" — camers/single.py:63-66). Each
    * expansion is collapse-then-expand (the expanded form is first
    * collapsed back to the abbreviation, then the abbreviation expands)
    * so the rewrite is idempotent WITHOUT lookahead — the list is
    * RE2-safe and generates the DuckDB oracle twin verbatim
    * (SparkEntry.sqlCameraNormalize). */
  val cameraAbbreviations: Seq[(String, String)] = Seq(
    "(?i)\\bultrasonic motor\\b" -> "USM",
    "(?i)\\busm\\b" -> "Ultrasonic Motor",
    "(?i)\\bsingle lens reflex\\b" -> "SLR",
    "(?i)\\bslr\\b" -> "Single Lens Reflex",
    "(?i)\\bef-s mount\\b" -> "EF-S",
    "(?i)\\bef-s\\b" -> "EF-S Mount")

  /** Camera brand standardization (camers/single.py:60-61: "Standardize
    * known brands: Canon, Nikon, Sigma, GoPro, Panasonic, Sony, etc.").
    * Case canonicalization at word boundaries + the "go pro"/"Gopro"/
    * "GOPRO" variants observed in camers/train.csv. Kept per-domain (a
    * separate table, not merged into `abbreviations`) so camera rows
    * never globalize into the software/address datasets. */
  val cameraBrands: Seq[(String, String)] = Seq(
    "(?i)\\bgo\\s*pro\\b" -> "GoPro",
    "(?i)\\bcanon\\b" -> "Canon",
    "(?i)\\bnikon\\b" -> "Nikon",
    "(?i)\\bsigma\\b" -> "Sigma",
    "(?i)\\bpanasonic\\b" -> "Panasonic",
    "(?i)\\bsony\\b" -> "Sony",
    "(?i)\\bolympus\\b" -> "Olympus",
    "(?i)\\bpentax\\b" -> "Pentax",
    "(?i)\\bfujifilm\\b" -> "Fujifilm")

  def cameraNormalize(c: Column): Column =
    (cameraAbbreviations ++ cameraBrands).foldLeft(c) {
      case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Match-sensitive unit unification (computer/procs.py:73-76: if
    * label = 1, "Unify units (e.g., \"3.5 inch\" → \"3.5in\",
    * \"7200 RPM\" → \"7200RPM\")"). Compacts number+unit pairs and NEVER
    * touches alphanumeric part codes (procs.py:62 "Never remove or alter
    * alphanumeric model numbers") — which is why wdcTitleAligned does NOT
    * reuse alignedTitleCleanup: that is the Amazon-software matched-pair
    * rule, and it deletes SKU codes. Idempotent; RE2-safe. */
  val unitCompactions: Seq[(String, String)] = Seq(
    "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*(?:inch|in)\\b" -> "$1in",
    "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*rpm\\b" -> "$1RPM",
    "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*gb\\b" -> "$1GB",
    "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*tb\\b" -> "$1TB",
    "(?i)\\b(\\d+(?:\\.\\d+)?)\\s*mhz\\b" -> "$1MHz")

  def unitUnify(c: Column): Column =
    wsCollapse(unitCompactions.foldLeft(c) {
      case (acc, (p, r)) => regexp_replace(acc, p, r) })

  /** R4: brand/entity canonicalization — corporate-suffix removal
    * (Amazon/prompt.py:92, Beer/process.py:81-84). */
  def dropCorpSuffixes(c: Column): Column =
    regexp_replace(c, "(?i)\\s+(inc|ltd|corp|corporation|llc|co)\\.?(\\s|$)", "$2")

  /** R4 lookup table: brand variants → canonical short form
    * (walmart/prompt.py:83 "Hewlett Packard"→"HP"; Beer/process.py:81-84
    * "Google LLC"/"google inc."→"Google"; computer/single.py:57-58 brand
    * list). Keys are matched on the lower-cased, suffix-dropped value. */
  val brandTable: Seq[(String, String)] = Seq(
    "hewlett packard" -> "HP", "hewlett-packard" -> "HP", "hp" -> "HP",
    "hpe" -> "HP", "google" -> "Google", "adobe systems" -> "Adobe",
    "adobe" -> "Adobe", "microsoft" -> "Microsoft", "intel" -> "Intel",
    "advanced micro devices" -> "AMD", "amd" -> "AMD",
    "western digital" -> "Western Digital", "wd" -> "Western Digital",
    "international business machines" -> "IBM", "ibm" -> "IBM",
    "samsung electronics" -> "Samsung", "samsung" -> "Samsung",
    "sony electronics" -> "Sony", "sony" -> "Sony",
    "asustek computer" -> "ASUS", "asus" -> "ASUS")

  /** R4 as a pure expression (closed table → codegen'd CASE chain; the
    * broadcast-join operator twin for open tables is
    * Enrichment.canonicalizeBrandJoin). Falls back to Title Case of the
    * suffix-dropped input for unknown brands. */
  def brandCanon(c: Column): Column = {
    val key = lower(trim(dropCorpSuffixes(c)))
    brandTable.foldLeft(when(c.isNull, lit(null).cast("string"))) {
      case (acc, (variant, canonical)) =>
        acc.when(key === variant, lit(canonical))
    }.otherwise(initcap(trim(dropCorpSuffixes(c))))
  }

  // ---------------- R14 matched-pair alignment helpers --------------------
  // (Amazon/prompt.py:76-99 "ALIGNMENT & NORMALIZATION FOR MATCHED PAIRS")

  /** Version/edition/license tokens to preserve and cross-copy
    * (Amazon/prompt.py:90-93: CS3, XI, X3, 11.0, 7.3, 2007, Professional,
    * Home, Standard, Upgrade, 3-User, Boxed). */
  private val versionTokenRe =
    "(?i)^(v?\\d+(\\.\\d+)*|cs\\d|x\\d{1,2}|xi{1,3}|(19|20)\\d\\d|" +
      "professional|pro|home|standard|premium|deluxe|upgrade|oem|boxed|" +
      "\\d+-user)$"

  def versionTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t.rlike(versionTokenRe))

  /** Matched-pair aggressive title cleanup (Amazon/prompt.py:77-85):
    * delete alphanumeric SKU/catalog codes (≥6 chars with a 4-digit run,
    * but never bare versions like "11.0"/"2007"), strip platform/media
    * bracket tags, trim generic marketing trailers. */
  def alignedTitleCleanup(c: Column): Column = {
    val noSku = regexp_replace(c,
      "(?i)\\b(?=[a-z]*\\d{4})(?=(?:[a-z0-9]*[a-z]){2})[a-z0-9]{6,}\\b", "")
    val noBrackets = regexp_replace(regexp_replace(noSku,
      "\\[[^\\]]*\\]", ""),
      "(?i)\\((?:[^)]*\\b(?:win(?:dows)?\\s*[0-9/me]*|mac|dvd|cd(?:-rom)?|pc)\\b[^)]*)\\)", "")
    val trailers = Seq(
      "(?i)\\bfull version of .*$", "(?i)\\bproduction software\\b.*$",
      "(?i)\\bsound editing s/?w\\b.*$",
      "(?i)\\bphoto editing software for windows\\b.*$",
      "(?i)\\bcomplete (package|product)\\b.*$",
      "(?i)\\bstandard english pc\\b.*$")
    val noTrailers = trailers.foldLeft(noBrackets)((acc, p) =>
      regexp_replace(acc, p, ""))
    wsCollapse(noTrailers)
  }

  /** R11: venue canonicalization (DBLACM/prompt.py:59-64). */
  def venueCanon(c: Column): Column = {
    val t = trim(c)
    when(t.rlike("(?i)^(international conference on management of data|sigmod|sigmod conference)$"),
        lit("SIGMOD Conference"))
      .when(t.rlike("(?i)^(acm sigmod record|sigmod record)$"), lit("ACM SIGMOD Record"))
      .when(t.rlike("(?i)^(the vldb journal.*|vldb j\\.|vldb journal)$"), lit("VLDB Journal"))
      .when(t.rlike("(?i)^(very large data bases|vldb|vldb conference)$"), lit("VLDB"))
      .otherwise(t)
  }

  /** Canonical title chain used by the ER pipeline: strip vendor noise +
    * lang tags, canonicalize units, dedupe words, lowercase, collapse ws.
    * (Composition of R1/R2/R5 + F4; the aggressive-alignment variant R14
    * is label-gated by callers and never applied at inference.) */
  def canonicalTitle(c: Column): Column = {
    val s0 = stripLangTags(c)
    val s1 = stripVendorNoise(s0)
    val s2 = unitSpacing(s1)
    val s3 = dedupeConsecutiveWords(s2)
    wsCollapse(lower(s3))
  }

  /** R6: model/part-number-looking tokens (preserve-specificity targets;
    * walmart/prompt.py:85, computer/procs.py:81-85). Applied to the
    * *lowercased* canonical title. */
  def modelTokens(c: Column): Column =
    filter(tokens(c), t =>
      t.rlike("^[a-z]*\\d{3,}[a-z0-9]*$") && length(t) >= 4)
}

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
    * computer/procs.py:60-63). Case-insensitive, anchored at end. */
  val vendorNoisePatterns: Seq[String] = Seq(
    "\\s*\\|\\s*cdw\\.com.*$", "\\s+scan\\s+uk\\s*$", "\\s*@tweakers\\s*$",
    "\\s*-\\s*newegg\\.com.*$", "\\s+best\\s+buy\\s*$", "\\s*\\(alternate\\)\\s*$",
    "\\s*\\|\\s*ebay\\s*$", "\\s+black\\s+friday.*$")

  def stripVendorNoise(c: Column): Column =
    vendorNoisePatterns.foldLeft(c)((acc, p) =>
      regexp_replace(acc, "(?i)" + p, ""))

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

  /** R4: brand/entity canonicalization — corporate-suffix removal
    * (Amazon/prompt.py:92, Beer/process.py:81-84). */
  def dropCorpSuffixes(c: Column): Column =
    regexp_replace(c, "(?i)\\s+(inc|ltd|corp|corporation|llc|co)\\.?(\\s|$)", "$2")

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

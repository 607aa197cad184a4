package graft.block

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/**
 * Blocking-key generation: normalized-domain keys + MinHash-LSH token
 * signatures (north_rule; SURVEY.md §7.2 M4). Everything is built-in
 * codegen'd expressions — the MinHash family is `xxhash64` with a
 * per-function seed prefix, so signatures are deterministic across runs
 * and parallelism levels.
 *
 * Scale design (100 TB): key generation is a narrow map; the only shuffle
 * is the explode+self-join downstream. Skewed blocks (mega-hosts, common
 * shingle bands) are (a) salted via `saltKey`, and (b) hard-capped per
 * block with the cap surfaced in a metrics table — no silent drops.
 */
object Blocking {

  /** Normalized host from a URL: lowercase, strip scheme/www/port/path. */
  def normalizedDomain(url: Column): Column = {
    val host = regexp_extract(lower(url), "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)", 1)
    regexp_replace(host, "^www\\.", "")
  }

  /** MinHash signature: array of `k` min-hashes over a token array. */
  def minHash(tokens: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(tokens, t => xxhash64(concat(lit(s"mh${i}_"), t))))
    }: _*)

  /** LSH band keys: `bands` keys, each hashing `rowsPerBand` consecutive
    * minhashes together with the band index. Null when tokens is empty. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      val slices = (0 until rowsPerBand).map(r =>
        element_at(sig, b * rowsPerBand + r + 1).cast(StringType))
      xxhash64(concat_ws("|", (lit(s"band$b") +: slices): _*))
    }: _*)

  /** One row per (blockKey, id...) from token minhashes; `idCols` are
    * carried through. Rows with no tokens produce no keys. */
  def minhashBlocks(df: DataFrame, tokensCol: Column, bands: Int,
      rowsPerBand: Int, keyName: String = "block_key"): DataFrame = {
    val sig = minHash(tokensCol, bands * rowsPerBand)
    df.withColumn("_sig", sig)
      .withColumn(keyName, explode(lshBandKeys(col("_sig"), bands, rowsPerBand)))
      .drop("_sig")
      .where(col(keyName).isNotNull)
  }

  /** Salt a hot key into `salts` sub-keys, deterministically by row id.
    * Use for block families where one key dominates (e.g. a mega-host):
    * pairs are then generated within sub-blocks only — recall loss is
    * bounded and surfaced by the caller's metrics. */
  def saltKey(key: Column, id: Column, salts: Int): Column =
    concat_ws("#", key, pmod(xxhash64(id), lit(salts)).cast(StringType))

  /** Cap rows per block at `cap` (deterministic by `orderCol`), returning
    * (kept, dropCounts) — dropCounts is a small metrics table
    * (block_key, n_total, n_dropped) for every truncated block. */
  def capBlocks(df: DataFrame, keyCol: String, orderCol: String, cap: Int)
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val ranked = df.withColumn("_rn", row_number().over(w))
    val kept = ranked.where(col("_rn") <= cap).drop("_rn")
    val drops = ranked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_total"))
      .where(col("n_total") > cap)
      .withColumn("n_dropped", col("n_total") - cap)
    (kept, drops)
  }

  /** Candidate pairs from a blocked table: self-join within block key with
    * a strict ordering predicate, deduped across key families.
    *
    * Scale notes: the join shuffles both sides on `keyCol` (sort-merge or
    * shuffled-hash chosen by Catalyst/AQE; AQE skew-join splits oversized
    * partitions). `dropDuplicates` over (left_id, right_id) is the standard
    * LSH pair-dedup and shuffles once on the pair id — unavoidable for
    * exact dedup and linear in candidate count, not corpus size. */
  def candidatePairs(blocked: DataFrame, keyCol: String, idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val cols = (Seq(idCol) ++ payloadCols)
    val l = blocked.select((keyCol +: cols).map(col): _*)
      .toDF((keyCol +: cols.map("l_" + _)): _*)
    val r = blocked.select((keyCol +: cols).map(col): _*)
      .toDF((keyCol +: cols.map("r_" + _)): _*)
    l.join(r, Seq(keyCol))
      .where(col("l_" + idCol) < col("r_" + idCol))
      .dropDuplicates("l_" + idCol, "r_" + idCol)
  }
}

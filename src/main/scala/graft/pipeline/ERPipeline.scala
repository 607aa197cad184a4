package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.block.Blocking
import graft.cluster.ConnectedComponents
import graft.eval.Metrics
import graft.functions.GraftFunctions
import graft.norm.Normalize
import graft.score.Similarity

/**
 * End-to-end entity-resolution pipeline (north_rule):
 *
 *   pages(url, warc_ts, html, text, lang)
 *     → extract canonical text          (reference-parity extractor, §2.4)
 *     → blocking keys                   (normalized domain ∪ MinHash-LSH)
 *     → candidate pairs                 (blocked self-join, capped, deduped)
 *     → pairwise scoring                (Jaro-Winkler + Levenshtein + token
 *                                        cosine/Jaccard; model-token guard)
 *     → threshold → edges → connected components (large-star/small-star)
 *     → clusters(url, component) + metrics
 *
 * Scale design notes (100 TB / 10^12 docs):
 *  - Extraction + key-gen are narrow maps (whole-stage codegen; only the
 *    COL/VAL parse itself is a JVM function).
 *  - The candidate join shuffles on block_key; AQE skew-join plus the
 *    per-block pair cap bound the quadratic blowup of mega-blocks, with
 *    drops surfaced in `capDrops` (never silent).
 *  - Pair dedup + CC shuffle on 64-bit ids, never on full strings.
 *  - Every stage can be snapshotted via graft.io.Snapshots for resume.
 */
object ERPipeline {

  final case class Config(
      minhashBands: Int = 8,
      minhashRows: Int = 4,
      pairCapPerBlock: Int = 1000,
      scoreThreshold: Double = 0.90,
      useDomainKeys: Boolean = false, // domain blocks = vendor sites here:
                                      // same entity spans hosts, so LSH is
                                      // the recall path; domain keys are an
                                      // optional extra family
      maxCcIterations: Int = 50)

  /** Stage 1: canonical text per url (per-row invariant vs the reference
    * extractor — GraftFunctions.extractTitleUdf is the parity chain). */
  def extract(pages: DataFrame): DataFrame =
    pages.select(
      col("url"),
      xxhash64(col("url")).as("id"),
      GraftFunctions.extractTitleUdf(col("text")).as("canonical_text"))
      .withColumn("norm_title", Normalize.canonicalTitle(col("canonical_text")))
      .withColumn("tokens", GraftFunctions.tokens(col("norm_title")))
      .withColumn("model_tokens", Normalize.modelTokens(col("norm_title")))

  /** Stage 2: blocking keys — one row per (block_key, page). */
  def block(extracted: DataFrame, cfg: Config): DataFrame = {
    val lsh = Blocking.minhashBlocks(
      extracted, col("tokens"), cfg.minhashBands, cfg.minhashRows)
    val withDomain =
      if (!cfg.useDomainKeys) lsh
      else lsh.unionByName(extracted.withColumn("block_key",
        xxhash64(Blocking.normalizedDomain(col("url")))))
    withDomain
  }

  /** Stage 3+4: candidate pairs + scores. Returns scored pairs. */
  def scorePairs(blocked: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val (capped, drops) = Blocking.capBlocks(blocked, "block_key", "id",
      cfg.pairCapPerBlock)
    val pairs = Blocking.candidatePairs(capped, "block_key", "id",
      Seq("url", "norm_title", "tokens", "model_tokens"))
    val jw = Similarity.jaro_winkler(col("l_norm_title"), col("r_norm_title"))
    val lev = Similarity.levenshteinRatio(col("l_norm_title"), col("r_norm_title"))
    val cos = Similarity.tokenCosine(col("l_tokens"), col("r_tokens"))
    val jac = Similarity.jaccard(col("l_tokens"), col("r_tokens"))
    // R6 preserve-specificity guard: disjoint model-number tokens on both
    // sides is strong evidence of distinct entities.
    val modelsDisjoint = size(col("l_model_tokens")) > 0 &&
      size(col("r_model_tokens")) > 0 &&
      size(array_intersect(col("l_model_tokens"), col("r_model_tokens"))) === 0
    val raw = lit(0.25) * jw + lit(0.15) * lev + lit(0.30) * cos + lit(0.30) * jac
    val scored = pairs
      .withColumn("jw", jw).withColumn("lev", lev)
      .withColumn("cosine", cos).withColumn("jaccard", jac)
      .withColumn("score", when(modelsDisjoint, raw * 0.5).otherwise(raw))
    (scored, drops)
  }

  /** Stage 5: threshold → edges → connected components → (id, component). */
  def cluster(spark: SparkSession, scored: DataFrame, cfg: Config): DataFrame = {
    val edges = scored.where(col("score") >= cfg.scoreThreshold)
      .select(col("l_id").as("src"), col("r_id").as("dst"))
    ConnectedComponents.run(spark, edges, cfg.maxCcIterations)
  }

  /** Full run: returns (clusters(url, id, component), capDrops). Pages with
    * no edge above threshold form singleton clusters (component = own id). */
  def run(spark: SparkSession, pages: DataFrame,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val ex = extract(pages)
    val blocked = block(ex, cfg)
    val (scored, drops) = scorePairs(blocked, cfg)
    val comps = cluster(spark, scored, cfg)
    val assign = ex.select(col("url"), col("id"))
      .join(comps, Seq("id"), "left")
      .select(col("url"), col("id"),
        coalesce(col("component"), col("id")).as("component"))
    (assign, drops)
  }

  /** Evaluate a clustering against labeled url pairs → 1-row P/R/F1. */
  def evaluate(clusters: DataFrame, labeledPairs: DataFrame): DataFrame = {
    val cl = clusters.select(col("url"), col("component"))
    val joined = labeledPairs
      .join(cl.toDF("left_url", "l_comp"), Seq("left_url"), "left")
      .join(cl.toDF("right_url", "r_comp"), Seq("right_url"), "left")
      .withColumn("pred",
        when(col("l_comp").isNotNull && col("l_comp") === col("r_comp"), 1)
          .otherwise(0))
      .withColumnRenamed("label", "gold")
    Metrics.prf1(joined)
  }
}

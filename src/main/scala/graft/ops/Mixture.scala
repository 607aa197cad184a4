package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Token-budget domain-mixture sampling — the "data mixing" step of a
 * pre-training pipeline: given target mixture weights per domain (source)
 * and a total token budget, derive a per-domain keep rate
 * `min(1, budget * weight / domain_tokens)` and keep each row by the same
 * consistent-hash membership test as [[Sampling]] (a pure function of the
 * row key — reproducible under retries / AQE / engine changes).
 *
 * Scale shape: one partial-aggregated `groupBy(domain)` over the corpus
 * (map-side combine; #domains rows), broadcast back onto the corpus, then
 * a narrow codegen'd filter. The corpus itself never shuffles. Domains
 * not listed in `weights` are dropped (their target share is 0) —
 * training-mixture semantics, not stratified-sample semantics (for the
 * latter see [[Sampling.stratifiedSampleByKey]]).
 *
 * Determinism note: the rate is `least(1.0, budget * w / S_d)` evaluated
 * in IEEE-754 double with the same association in the DuckDB oracle twin,
 * and the membership unit value is the shared md5-based
 * [[Sampling.hashUnit]] — every comparison is bit-identical cross-engine.
 */
object Mixture {

  /** @param df       corpus
    * @param domain   domain / source column (string)
    * @param key      unique row key (drives consistent-hash membership)
    * @param cost     per-row cost in budget units (tokens, chars, bytes)
    * @param weights  target mixture weights per domain; unlisted domains
    *                 are excluded from the sample
    * @param budget   total cost budget across all listed domains
    */
  def tokenBudgetSample(df: DataFrame, domain: Column, key: Column,
      cost: Column, weights: Seq[(String, Double)], budget: Long): DataFrame = {
    val temps = Set("mx_domain", "mx_cost", "mx_w", "mx_total", "mx_rate")
    require(!df.columns.exists(temps),
      s"input columns collide with Mixture temporaries ${temps.mkString(", ")}")
    val spark = df.sparkSession
    val dom = domain.as("mx_domain")
    val totals = df.select(dom, cost.cast(LongType).as("mx_cost"))
      .groupBy($("mx_domain")).agg(sum($("mx_cost")).as("mx_total"))
    // weight CASE chain: no driver-side collect, no second job
    val w = weights.foldRight(lit(null).cast(DoubleType): Column) {
      case ((d, r), acc) => when($("mx_domain") === lit(d), lit(r)).otherwise(acc)
    }
    // The null check must happen BEFORE least(): Spark's (and DuckDB's)
    // least/greatest IGNORE nulls, so least(1.0, null-weight) would be
    // 1.0 and an unlisted domain would be kept whole instead of dropped.
    val rates = totals.withColumn("mx_w", w)
      .where($("mx_w").isNotNull)
      .select($("mx_domain"),
        least(lit(1.0),
          lit(budget).cast(DoubleType) * $("mx_w")
            / $("mx_total").cast(DoubleType))
          .as("mx_rate"))
    df.join(broadcast(rates), domain === $("mx_domain"))
      .where(Sampling.hashUnit(key) < $("mx_rate"))
      .drop("mx_domain", "mx_rate")
  }

  private def $(name: String): Column = col(name)
}

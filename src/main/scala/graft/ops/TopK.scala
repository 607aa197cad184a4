package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Skew-aware per-key top-k — the crawl-budget operator: keep at most `k`
 * rows per key (host), preferring rows by an explicit deterministic
 * ordering (quality score, recency, ...).
 *
 * A naive `row_number().over(partitionBy(key))` sorts EVERY key's rows,
 * and a single mega-host (every web crawl has one) serializes into one
 * task's sort. Here only rows of keys that actually exceed `k` pay the
 * window sort (same discipline as `Blocking.capBlocks`): a partial-agg
 * count finds the over-budget keys, under-budget keys stream through
 * untouched (semi/anti joins Catalyst can broadcast when the hot-key set
 * is small — on a crawl it is), and the window runs on the hot slice
 * only.
 *
 * Ordering must be total and deterministic (break ties on a unique key)
 * or the kept set is nondeterministic under retries.
 */
object TopK {

  /** @param orderBy deterministic total order; first = most preferred. */
  def perKey(df: DataFrame, key: Column, orderBy: Seq[Column], k: Int)
      : DataFrame = {
    require(k > 0, "k must be positive")
    val keyName = "tk_key"
    val keyed = df.withColumn(keyName, key)
    val hot = keyed.groupBy(col(keyName))
      .agg(count(lit(1)).as("tk_n"))
      .where(col("tk_n") > k)
      .select(col(keyName))
    val cold = keyed.join(hot, Seq(keyName), "left_anti")
    val capped = keyed.join(hot, Seq(keyName), "left_semi")
      .withColumn("tk_rn",
        row_number().over(Window.partitionBy(col(keyName)).orderBy(orderBy: _*)))
      .where(col("tk_rn") <= k)
      .drop("tk_rn")
    cold.unionByName(capped).drop(keyName)
  }
}

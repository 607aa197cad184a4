package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization — the standard web-log operator: events of one
 * key (user, ip, device) ordered by time are split into sessions wherever
 * the gap to the previous event exceeds `gapSeconds`. The reference's
 * event-log shape (url visits with crawl timestamps) makes this the
 * natural per-user rollup for a Common-Crawl-style pipeline.
 *
 * One hash shuffle on the key; the session number is an incremental
 * running sum over an explicit ROWS frame (never a per-row rescan), and
 * the downstream per-session aggregate reuses the same hash partitioning
 * (grouping on (key, session_seq) is clustered by key alone), so the
 * whole operator is a single exchange end-to-end — plan-asserted in
 * SessionizeSpec.
 *
 * Determinism: the window orders by (ts, tieBreak); callers pass a unique
 * tie-break column (event id) so lag/cumsum are reproducible at any
 * parallelism and engine (the DuckDB oracle orders identically).
 *
 * Scale: per-key work is linear in that key's event count; a hot key
 * serializes inside its partition like any ordered per-key pass. At
 * 10^12-event scale, keys whose history exceeds a partition are pre-split
 * by coarse time bucket (same discipline as Blocking.splitOversizedBlocks)
 * with the boundary session stitched by carrying the bucket's last event
 * time forward — not needed at any driver sf.
 *
 * Timestamps stay in timestamp arithmetic (`ts - lag(ts) > INTERVAL`):
 * no epoch casts, so TIMESTAMP and TIMESTAMP_NTZ inputs both work and the
 * semantics are timezone-free.
 */
object Sessionize {

  /** Appends `session_seq`: 1-based session number per key, a new session
    * starting when the gap from the previous event is strictly greater
    * than `gapSeconds` (or at the key's first event). */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      gapSeconds: Int): DataFrame = {
    val order = Window.partitionBy(key).orderBy(ts.asc, tieBreak.asc)
    val prev = lag(ts, 1).over(order)
    val isNew = when(
      prev.isNull || ts - prev > make_dt_interval(
        lit(0), lit(0), lit(0), lit(gapSeconds)), 1L).otherwise(0L)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("session_seq", sum(isNew).over(running))
  }

  /** Per-session rollup: start/end/duration/event count (+ caller aggs).
    * Groups on (key, session_seq) — clustered by the sessionize shuffle,
    * so this adds no exchange. */
  def sessionStats(sessionized: DataFrame, key: Column, ts: Column,
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(
      min(ts).as("session_start"),
      max(ts).as("session_end"),
      count(lit(1)).as("n_events")) ++ extraAggs
    sessionized.groupBy(key, col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }
}

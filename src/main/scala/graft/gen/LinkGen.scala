package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic host-link-graph fixture for crawl-prioritization ops
 * ([[graft.graph.PageRank]]): `n` hosts, each with `2 + (id % 4)`
 * out-links whose targets mix three regimes a real web host graph has —
 * a hub bias (a few hosts receive many links), a local ring, and a
 * pseudo-random remainder. Pure column expressions (seed-deterministic at
 * any parallelism); self-loops are impossible by construction and
 * duplicate (src, dst) rows may occur (consumers must dedup — real link
 * tables have them too).
 *
 * Every host emits 2-5 raw links whose targets are all != src, so after
 * dedup every host has outdegree >= 1 — the graph has no dangling nodes
 * and the ids 0..n-1 are exactly the node set. (>= 2 is NOT guaranteed:
 * a host's hub and ring targets can collide into one distinct dst.)
 */
object LinkGen {

  def links(spark: SparkSession, n: Int = 400, seed: Long = 23L): DataFrame = {
    val src = col("id")
    val j = col("j")
    // raw target in 0..n-2, then skip over src to forbid self-loops
    val hub = pmod(xxhash64(src, j, lit(seed)), lit(8)) // hosts 0..7 are hubs
    val ring = pmod(src + j + 1, lit(n.toLong))
    val rnd = pmod(xxhash64(src, j, lit(seed), lit(1)), lit(n.toLong))
    val pickRaw = when(pmod(j, lit(3)) === 0, hub)
      .otherwise(when(pmod(j, lit(3)) === 1, ring).otherwise(rnd))
    val raw = pmod(pickRaw, lit((n - 1).toLong)) // 0..n-2
    val dst = when(raw >= src, raw + 1).otherwise(raw) // != src, in 0..n-1
    spark.range(n.toLong)
      .select(src, explode(sequence(lit(0L),
        lit(1L) + pmod(src, lit(4)))).as("j"))
      .select(src.as("src"), dst.as("dst"))
  }
}

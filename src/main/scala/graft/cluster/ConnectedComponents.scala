package graft.cluster

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Transitive closure via alternating large-star / small-star iterations
 * (Kiveris et al., "Connected Components in MapReduce and Beyond",
 * SoCC 2014) over plain DataFrames — no GraphX, no driver-side state
 * (SURVEY.md §7.2 M6; north_rule "union-find transitive closure as
 * iterative DataFrame joins with checkpointed convergence").
 *
 * Input: undirected edges (src, dst) as 64-bit ids. Output: (id, component)
 * where component = the minimum id in the node's component — a total,
 * deterministic labeling, identical at any parallelism level.
 *
 * Scale design: each round is two shuffles (groupBy min + join), O(log n)
 * rounds to converge; `localCheckpoint` after every round truncates
 * lineage so plan size stays constant. Convergence is detected by an
 * order-independent checksum (count + exact decimal sum of pair hashes)
 * of the deduped edge set, collected via `observe` DURING the round's own
 * materialization job — zero extra jobs / driver round-trips per round
 * (the driver's per-round serial work is pure Amdahl overhead that caps
 * N-vs-4N scaling efficiency).
 */
object ConnectedComponents {

  /** @param edges DataFrame with two numeric columns (src, dst).
    * @param persist per-round state materializer. MUST be eager (run a job
    *   materializing its input — `localCheckpoint()`/`checkpoint()` both
    *   are): the convergence checksum is an `observe` metric harvested from
    *   that job. Default `localCheckpoint` is fast but memory-pinned and
    *   NOT fault-tolerant — production runs (PipelineApp) pass
    *   `_.checkpoint()` so round state lands on reliable storage and a lost
    *   executor replays from the checkpoint, not from the whole lineage.
    * @param driverUnionFindMaxEdges adaptive small-graph cutoff: when the
    *   DEDUPED edge set (counted for free by the first round's observe
    *   checksum) fits under this bound, the closure is computed by a
    *   driver-side union-find over the collected edges instead of the
    *   O(log n) alternating-star rounds — the same size-adaptive
    *   discipline as a broadcast join. Driver footprint at the default
    *   500k-edge bound: primitive edge arrays + the parent map + the
    *   result rows ≈ low hundred MB transient worst-case (comparable to
    *   a mid-sized broadcast relation) — size the bound to the driver
    *   heap, not just taste. Near-dup CC inputs are pair tables that are
    *   routinely orders of magnitude smaller than the corpus, so this
    *   removes every per-round shuffle + materialization in the common
    *   case while the distributed path runs unchanged beyond the bound.
    *   Labeling is identical by construction (min id per component;
    *   union always roots the smaller id, spec-pinned against the
    *   distributed path). Set to 0 to force the distributed path.
    * @return DataFrame(id LONG, component LONG), one row per distinct node. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 50,
      persist: DataFrame => DataFrame = _.localCheckpoint(),
      driverUnionFindMaxEdges: Long = 500000L): DataFrame = {
    import spark.implicits._
    val base = edges.toDF("src", "dst")
      .select(col("src").cast("long"), col("dst").cast("long"))
      .where($"src" =!= $"dst")
      .select(least($"src", $"dst").as("lo"), greatest($"src", $"dst").as("hi"))
      .distinct()
    // (node set is derived from the PERSISTED first-round edge set below,
    // not from `base`: deriving it here would re-run the caller's whole
    // upstream lineage — e.g. a minhash pair generation — a second time
    // at the final assignment join.)

    // Materialize + checksum in ONE job: the order-independent exact
    // checksum (count + decimal sum of pair hashes; decimal keeps ANSI
    // mode overflow-free) rides the persist job as an observed metric.
    def persistWithChecksum(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
      val obs = Observation()
      val p = persist(df.observe(obs,
        count(lit(1)).as("cnt"),
        sum(xxhash64($"u", $"v").cast(DecimalType(38, 0))).as("cs")))
      // An eager persist (localCheckpoint()/checkpoint(), the documented
      // contract) has already run the job, so the metrics are ready and
      // this is free. A LAZY persist (cache(), identity) would make a
      // blind obs.get hang forever — detect the empty-metrics case and
      // force one materializing action instead, so every historical
      // persist signature still terminates (it just pays the extra job
      // the eager path avoids).
      var m = org.apache.spark.sql.graft.ColumnBridge.metricsOrEmpty(obs)
      if (m.isEmpty) {
        p.count()
        m = org.apache.spark.sql.graft.ColumnBridge.metricsOrEmpty(obs)
      }
      require(m.nonEmpty,
        "persist did not materialize its input and a forced count() did " +
          "not surface observe metrics; pass an eager persist such as " +
          "_.localCheckpoint() or _.checkpoint()")
      val cs = m("cs") match {
        case null => java.math.BigDecimal.ZERO
        case d: java.math.BigDecimal => d
        case d: scala.math.BigDecimal => d.bigDecimal
      }
      (p, (m("cnt").asInstanceOf[Long], cs))
    }

    // edge set invariant between rounds: canonical (hi > lo) pairs
    var (cur, curSum) = persistWithChecksum(base.select($"hi".as("u"), $"lo".as("v")))

    // Small-graph fast path: the deduped edge count came for free with the
    // first checksum; under the cutoff, collect the (already materialized)
    // edges and close them on the driver — zero further jobs, and the
    // result is a LocalRelation the final assignment join can broadcast.
    if (curSum._1 <= driverUnionFindMaxEdges) return unionFindLocal(spark, cur)

    val nodes = cur.select($"u".as("id"))
      .union(cur.select($"v".as("id"))).distinct()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // --- large-star: connect strictly-larger neighbors to the min ------
      // symmetrized adjacency
      val adj = cur.select($"u", $"v")
        .union(cur.select($"v".as("u"), $"u".as("v")))
      val minNbr = adj.groupBy($"u")
        .agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val large = adj.join(minNbr, "u")
        .where($"v" > $"u")
        .select($"v".as("a"), $"m".as("b"))
        .where($"a" =!= $"b")
        .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
        .distinct()

      // --- small-star: connect smaller-or-equal neighbors + self to min --
      // operate on edges oriented u > v (all of `large` already are)
      val minSmall = large.groupBy($"u").agg(min($"v").as("m"))
      val small = large.join(minSmall, "u")
        .select(explode(array(
            struct($"v".as("a"), $"m".as("b")),
            struct($"u".as("a"), $"m".as("b")))).as("e"))
        .select($"e.a".as("a"), $"e.b".as("b"))
        .where($"a" =!= $"b")
        .select(greatest($"a", $"b").as("u"), least($"a", $"b").as("v"))
        .distinct()
      // convergence test: checksum of the new edge set vs the previous
      // round's (a collision would need equal count AND equal exact sum
      // of 64-bit pair hashes). Collected inside the persist job itself —
      // no separate aggregate job.
      val (smallP, smallSum) = persistWithChecksum(small)
      converged = smallSum == curSum
      curSum = smallSum
      cur = smallP
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // After convergence the graph is a union of stars rooted at component
    // minima: every edge is (member, root).
    val assign = cur.select($"u".as("id"), $"v".as("component"))
    nodes.join(assign, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }

  /** Driver-side transitive closure of a collected canonical edge set:
    * union-find with the min-id root kept on every union, so the final
    * root of each tree is the component minimum — the exact labeling the
    * distributed alternating-star path converges to. Output schema
    * mirrors the distributed path (id/component LONG, nullable). */
  private def unionFindLocal(spark: SparkSession, edges: DataFrame)
      : DataFrame = {
    // primitive edge arrays (the collected Rows are released before the
    // node pass) — the boxed-collection variant roughly tripled the
    // transient driver footprint at the cutoff
    var rows = edges.collect()
    val n = rows.length
    val us = new Array[Long](n)
    val vs = new Array[Long](n)
    var i = 0
    while (i < n) { us(i) = rows(i).getLong(0); vs(i) = rows(i).getLong(1); i += 1 }
    rows = null
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent(root)
      var c = x
      while (c != root && parent.getOrElse(c, c) != root) {
        val nxt = parent(c); parent(c) = root; c = nxt
      }
      root
    }
    i = 0
    while (i < n) {
      val ra = find(us(i)); val rb = find(vs(i))
      if (ra != rb) {
        val lo = math.min(ra, rb); val hi = math.max(ra, rb)
        parent(hi) = lo
      }
      i += 1
    }
    // distinct node ids via one primitive sort + in-place dedup
    val ids = new Array[Long](2 * n)
    System.arraycopy(us, 0, ids, 0, n)
    System.arraycopy(vs, 0, ids, n, n)
    java.util.Arrays.sort(ids)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    i = 0
    while (i < ids.length) {
      if (i == 0 || ids(i) != ids(i - 1))
        out.add(org.apache.spark.sql.Row(ids(i), find(ids(i))))
      i += 1
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("component",
        org.apache.spark.sql.types.LongType))))
  }
}

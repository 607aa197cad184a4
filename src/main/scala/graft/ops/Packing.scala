package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Sequence packing — the LLM pre-training step that concatenates documents
 * and chops the stream into fixed-length training sequences (`seqLen`
 * tokens), letting documents straddle sequence boundaries (the standard
 * "packed" pre-training layout, e.g. GPT-3 §2.1 / T5 / Megatron data
 * loaders), as one declarative plan:
 *
 *   1. shard: each doc lands in one of `nShards` deterministic shards via
 *      the engine-portable [[Sampling.hashUnit]] (packing is inherently
 *      sequential, so parallelism comes from packing shards
 *      independently — on a cluster each shard is one task's sort run);
 *   2. offset: running token offset per shard = window cumsum ordered by
 *      the doc key (ONE shuffle: `partitionBy(shard) orderBy(key)`);
 *   3. chop: a doc spanning token interval [off, off+n) emits one row per
 *      training sequence it overlaps via `explode(sequence(...))` —
 *      `seq_idx = off DIV seqLen .. (off+n-1) DIV seqLen` — with the
 *      half-open token sub-span `[tok_begin, tok_end)` of the doc that
 *      falls in that sequence. All integer arithmetic (no float), so the
 *      layout is bit-identical at any parallelism and across engines.
 *
 * Output: (shard, seq_id, <key>, tok_begin, tok_end) — the exact assembly
 * plan a training data-loader needs: `seq_id` is globally unique
 * (`shard * 2^40 + seq_idx`; 2^40 sequences/shard bounds a shard at ~2^51
 * tokens for seqLen=2048). Every sequence in a shard except the last is
 * exactly `seqLen` tokens full by construction.
 *
 * Scale shape: one hash-partitioned sort (the cumsum window) + a narrow
 * explode. Shard count picks the parallelism/skew trade-off: shards ≈
 * 2-4× executor cores keeps sort runs balanced (hashUnit is uniform) and
 * each run spills gracefully if a shard exceeds memory.
 */
object Packing {

  /** @param df      corpus; rows with non-positive `tokens` are dropped
    * @param key     unique, orderable doc key (concatenation order within
    *                a shard is ascending `key` — deterministic). Uniqueness
    *                is ENFORCED: a duplicate key fails the job loudly
    *                (see dupGuard below) instead of silently corrupting
    *                the packed layout.
    * @param tokens  per-doc token count
    * @param seqLen  training sequence length in tokens
    * @param nShards number of independently packed shards */
  def packSequences(df: DataFrame, key: Column, tokens: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val L = lit(seqLen.toLong)
    val base = df.select(key.cast(LongType).as("k"),
        tokens.cast(LongType).as("n"))
      .where(col("n") > 0)
      .withColumn("shard",
        floor(Sampling.hashUnit(col("k")) * lit(nShards.toDouble))
          .cast(IntegerType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("k")
    // Duplicate keys would TIE in the cumsum's default RANGE frame (both
    // rows get the same off_end → silently overlapping spans), so the
    // unique-key contract is enforced loudly: a lag() over the same
    // window spec (same sort run — no extra exchange or pass) trips
    // assert_true on the first adjacent duplicate. On success the term
    // is null → coalesce contributes 0 to off_begin.
    val dupGuard = coalesce(
      assert_true(!(col("k") <=> lag(col("k"), 1).over(w)),
        concat(lit("Packing.packSequences: duplicate key "), col("k")))
        .cast(LongType),
      lit(0L))
    val off = base
      .withColumn("off_end", sum(col("n")).over(w))
      .withColumn("off_begin", col("off_end") - col("n") + dupGuard)
    off.select(col("shard"), col("k"), col("n"), col("off_begin"),
        explode(sequence(
          expr(s"off_begin DIV ${seqLen}"),
          expr(s"(off_end - 1) DIV ${seqLen}"))).as("seq_idx"))
      .select(
        col("shard"),
        (col("shard").cast(LongType) * lit(1L << 40) + col("seq_idx"))
          .as("seq_id"),
        col("k"),
        greatest(lit(0L), col("seq_idx") * L - col("off_begin"))
          .as("tok_begin"),
        least(col("n"), (col("seq_idx") + lit(1L)) * L - col("off_begin"))
          .as("tok_end"))
  }
}

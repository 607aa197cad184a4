package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private val seqLen = 100
  private lazy val docs = (1L to 300L).map(i => (i, 1L + (i * 7) % 250))
    .toDF("doc_id", "n_tok")
  // no .cache(): the shared-session CacheManager must stay empty
  // (DittoConverterSpec's storage-leak assertion is suite-global)
  private lazy val packed = Packing.packSequences(
    docs, $"doc_id", $"n_tok", seqLen = seqLen, nShards = 4)

  test("every sequence except a shard's last is exactly seqLen full") {
    val lastSeq = packed.groupBy($"shard")
      .agg(max($"seq_id").as("last_seq"))
    val bad = packed.groupBy($"shard", $"seq_id")
      .agg(sum($"tok_end" - $"tok_begin").as("filled"))
      .join(lastSeq, "shard")
      .where($"seq_id" =!= $"last_seq" && $"filled" =!= seqLen.toLong)
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("per-doc spans tile [0, n) exactly — no gaps, no overlap, no loss") {
    val perDoc = packed.groupBy($"k")
      .agg(min($"tok_begin").as("mn"), max($"tok_end").as("mx"),
        sum($"tok_end" - $"tok_begin").as("covered"),
        count(lit(1)).as("spans"))
      .join(docs.withColumnRenamed("doc_id", "k"), "k")
    val bad = perDoc.where(
      $"mn" =!= 0L || $"mx" =!= $"n_tok" || $"covered" =!= $"n_tok").collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
    // every doc present (none had n <= 0 here)
    assert(perDoc.count() === 300L)
  }

  test("sequence ids are dense per shard from 0") {
    val bad = packed.groupBy($"shard")
      .agg(countDistinct($"seq_id").as("n_seq"),
        (max($"seq_id") - min($"seq_id") + 1).as("range"),
        min($"seq_id" - $"shard".cast("long") * lit(1L << 40)).as("first_idx"))
      .where($"n_seq" =!= $"range" || $"first_idx" =!= 0L)
      .collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("layout is identical at any input partitioning") {
    val a = packed.orderBy("seq_id", "k").collect().toSeq
    val b = Packing.packSequences(docs.repartition(13), $"doc_id", $"n_tok",
      seqLen = seqLen, nShards = 4).orderBy("seq_id", "k").collect().toSeq
    assert(a === b)
  }

  test("non-positive token counts are dropped, not packed") {
    val withJunk = docs.union(Seq((9001L, 0L), (9002L, -5L)).toDF("doc_id", "n_tok"))
    val p = Packing.packSequences(withJunk, $"doc_id", $"n_tok",
      seqLen = seqLen, nShards = 4)
    assert(p.where($"k" >= 9000L).count() === 0L)
  }

  test("duplicate keys fail loudly instead of silently overlapping spans") {
    val dup = docs.union(Seq((7L, 42L)).toDF("doc_id", "n_tok"))
    val ex = intercept[Exception] { // SparkRuntimeException (USER_RAISED)
      Packing.packSequences(dup, $"doc_id", $"n_tok",
        seqLen = seqLen, nShards = 4).collect()
    }
    assert(ex.getMessage.contains("duplicate key") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate key")),
      ex.getMessage)
  }
}

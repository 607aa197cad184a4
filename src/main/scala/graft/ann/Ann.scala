package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.score.Similarity

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (array<float>). Baseline: brute-force cosine top-k (broadcast the query
 * side — the scan side streams, no shuffle of the corpus). Scale path:
 * random-hyperplane LSH bucketing so candidate generation is a bucket
 * equi-join instead of a cross join.
 */
object Ann {

  /** Cosine similarity with both sides cast to double (deterministic
    * sequential fold via `aggregate`). */
  def cosine(a: Column, b: Column): Column =
    Similarity.vecCosine(
      transform(a, x => x.cast(DoubleType)),
      transform(b, x => x.cast(DoubleType)))

  /** Brute-force top-k neighbors for the first `nQueries` vec_ids.
    * Query side is tiny → broadcast; corpus side never shuffles until the
    * final per-query top-k (k rows per query). Scores rounded to 6dp
    * before ranking so ordering is reproducible across engines. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = emb.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val scored = corpus.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cos"), col("rank"))
  }

  /** splitmix64 finalizer — deterministic sign stream for the planes. */
  @inline private def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Deterministic ±1 hyperplane, materialized ONCE as an array literal
    * (the previous formulation recomputed bits×dim hash calls per row). */
  private def planeLit(bit: Int, dim: Int): Column =
    typedLit((0 until dim).map(j =>
      if ((mix64(bit.toLong * 1000003L + j) & 1L) == 0L) 1.0d else -1.0d).toArray)

  /** Random-hyperplane LSH signature: `bits` sign-bits of dot products
    * with deterministic ±1 hyperplanes baked in as literals — per-row work
    * is exactly bits×dim multiply-adds, fully codegen'd, no stored model. */
  def rhpSignature(emb: Column, bits: Int, dim: Int): Column = {
    val sigBits = (0 until bits).map { b =>
      val dot = aggregate(
        zip_with(emb, planeLit(b, dim), (x, w) => x.cast(DoubleType) * w),
        lit(0.0d), (acc, v) => acc + v)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }
    sigBits.reduce((a: Column, b: Column) => a + b)
  }

  /** Embedding dimensionality probed from the first row (one tiny job);
    * callers at true scale should pass the known dim instead. */
  def probeDim(emb: DataFrame, embCol: String = "embedding"): Int =
    emb.select(size(col(embCol))).head().getInt(0)

  /** Embedding near-duplicate pairs: bucket by RHP signature, verify by
    * exact cosine >= cosFloor. Multi-probe: also joins buckets at hamming
    * distance 1 (flip each bit) to recover near-boundary pairs. */
  def cosineNearDupLsh(emb: DataFrame, bits: Int, cosFloor: Double,
      dimOpt: Option[Int] = None): DataFrame = {
    val dim = dimOpt.getOrElse(probeDim(emb))
    val sig = emb.select(col("vec_id"), col("embedding"),
      rhpSignature(col("embedding"), bits, dim).as("sig"))
    // probe buckets: own signature + each 1-bit flip
    val probes = sig.withColumn("bucket", explode(array(
      (col("sig") +: (0 until bits).map(b =>
        col("sig").bitwiseXOR(lit(1L << b)))): _*)))
    val l = sig.select(col("sig").as("bucket"), col("vec_id").as("l_id"),
      col("embedding").as("l_emb"))
    val r = probes.select(col("bucket"), col("vec_id").as("r_id"),
      col("embedding").as("r_emb"))
    l.join(r, Seq("bucket")).where(col("l_id") < col("r_id"))
      .dropDuplicates("l_id", "r_id")
      .withColumn("cos", round(cosine(col("l_emb"), col("r_emb")), 6))
      .where(col("cos") >= cosFloor)
      .select(col("l_id"), col("r_id"), col("cos"))
  }
}

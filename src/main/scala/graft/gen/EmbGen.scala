package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic embedding-corpus fixture with PLANTED near-duplicates —
 * the nonzero-recall twin of the testdata `embeddings` table (whose sf0.1
 * slice contains no pair above the 0.9 near-dup floor, so it only ever
 * exercises the true-negative path of the LSH pair pipeline).
 *
 * Three populations, all pure column expressions (codegen'd, no driver
 * loops, reproducible at any parallelism):
 *  - `nBase` independent vectors: elements iid-uniform in [-1, 1] from
 *    xxhash64(vec_id, j, seed). Random 64-dim pairs sit at cos ~ N(0, 1/64)
 *    — far below any near-dup floor.
 *  - `nNear` planted near-duplicates of the first `nBase` vectors:
 *    v + eps·u with eps small ⇒ cos ≈ 1/sqrt(1+eps²) ≈ 0.9996 at the
 *    default — safely above floor AND within 1 flipped sign-bit of the
 *    base under 12-bit RHP signatures (multi-probe hamming-1 recovers
 *    them deterministically; verified exhaustively in AnnSpec and by the
 *    emb_neardup_lsh oracle).
 *  - `nFar` perturbed-but-distinct vectors: v + epsFar·u with epsFar
 *    large ⇒ cos ≈ 1/sqrt(1+epsFar²) ≈ 0.64 — related enough to look
 *    tempting, reliably below a 0.9 floor: the sub-floor REJECT path.
 *
 * Ids are disjoint from the testdata table (1e6+) so fixture rows can be
 * unioned with real-corpus results without ambiguity.
 */
object EmbGen {

  private def elem(id: Column, j: Column, salt: Long): Column =
    (pmod(xxhash64(id, j, lit(salt)), lit(2000001L)) - lit(1000000L)) /
      lit(1000000.0)

  private def vec(id: Column, dim: Int, salt: Long): Column =
    transform(sequence(lit(0), lit(dim - 1)), j => elem(id, j, salt))

  def embeddings(spark: SparkSession, nBase: Int = 192, nNear: Int = 32,
      nFar: Int = 16, dim: Int = 64, eps: Double = 0.03,
      epsFar: Double = 1.2, seed: Long = 13L): DataFrame = {
    require(nNear <= nBase && nFar <= nBase)
    def toFloat(arr: Column) = transform(arr, x => x.cast(FloatType))
    val base = spark.range(nBase.toLong)
      .select((col("id") + 1000000L).as("vec_id"),
        toFloat(vec(col("id"), dim, seed)).as("embedding"))
    def perturbed(n: Int, offset: Long, e: Double, salt: Long) =
      spark.range(n.toLong).select((col("id") + offset).as("vec_id"),
        toFloat(zip_with(
          vec(col("id"), dim, seed),
          vec(col("id") + offset, dim, salt),
          (v, u) => v + lit(e) * u)).as("embedding"))
    base
      .unionByName(perturbed(nNear, 1100000L, eps, seed + 1))
      .unionByName(perturbed(nFar, 1200000L, epsFar, seed + 2))
  }
}

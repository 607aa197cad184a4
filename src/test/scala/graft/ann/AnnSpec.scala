package graft.ann

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** RHP-LSH near-dup recall, cross-checked against brute force on a fixture
  * with PLANTED near-duplicates (the driver's embeddings.parquet fixture
  * contains none — max pairwise cosine ≈ 0.51 — so the query-level 0-row
  * result is a true negative; this spec proves the operator finds pairs
  * when they exist). */
class AnnSpec extends SparkSuite {
  import spark.implicits._

  private def fixture(n: Int, dim: Int) = {
    val rnd = new scala.util.Random(42)
    val base = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    // one near-duplicate per base vector: tiny relative perturbation
    val dups = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("LSH near-dup pairs: recall >= 0.9 vs brute-force truth, precision 1.0") {
    val emb = fixture(50, 32)
    val floor = 0.95
    // brute-force truth (small n): all pairs above the cosine floor
    val l = emb.select($"vec_id".as("l_id"), $"embedding".as("l_emb"))
    val r = emb.select($"vec_id".as("r_id"), $"embedding".as("r_emb"))
    val truth = l.join(r, $"l_id" < $"r_id")
      .withColumn("cos", Ann.cosine($"l_emb", $"r_emb"))
      .where($"cos" >= floor)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(truth.size >= 40, s"fixture must plant near-dups, got ${truth.size}")

    val found = Ann.cosineNearDupLsh(emb, bits = 8, cosFloor = floor)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // precision 1.0 by construction (exact-cosine verify step)
    assert(found.subsetOf(truth), s"false positives: ${found.diff(truth)}")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (${found.size}/${truth.size})")
  }

  test("IVF top-k: high recall vs brute force; full-probe equals exact") {
    val emb = fixture(40, 32)
    val truth = Ann.bruteForceTopK(emb, nQueries = 6, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // probing every list must reproduce brute force exactly
    val full = Ann.ivfTopK(emb, nQueries = 6, k = 3, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === truth)
    // partial probes: approximate but high-recall on this fixture
    val part = Ann.ivfTopK(emb, nQueries = 6, k = 3, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (part intersect truth).size.toDouble / truth.size
    assert(recall >= 0.7, s"ivf recall $recall")
  }

  test("signature is deterministic across partitionings") {
    val emb = fixture(20, 16)
    def sigs(parts: Int) = Ann.rhpSignature($"embedding", 10, 16)
    val a = emb.repartition(1).select($"vec_id", sigs(1).as("s"))
      .as[(Long, Long)].collect().toMap
    val b = emb.repartition(7).select($"vec_id", sigs(7).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}

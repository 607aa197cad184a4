package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  // scalar reference implementation (plain Scala, no Spark) for one doc
  private def refScore(tfs: Seq[(Long, Long)], dl: Long, nDocs: Long,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    val terms = tfs.map { case (tf, dft) =>
      val idf = math.log(1.0 + (nDocs - dft + 0.5) / (dft + 0.5))
      val s = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
      BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    terms.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private val docs = Seq(
    (1L, "apple banana apple cherry"),   // apple tf=2
    (2L, "apple banana banana banana"),  // banana tf=3
    (3L, "cherry dates dates"),
    (4L, "elder elder elder elder")
  ).toDF("doc_id", "text")

  private val queries = Seq((0L, "apple"), (0L, "banana"), (1L, "dates"))
    .toDF("query_id", "term")

  test("topK matches the scalar reference formula exactly") {
    val out = Bm25.topK(docs, $"doc_id", $"text", queries, k = 10)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (q, d, s, r) => (q, d) -> ((s, r)) }.toMap
    val nDocs = 4L; val avgdl = (4 + 4 + 3 + 4) / 4.0
    // query 0 on doc 1: apple tf=2 dft=2, banana tf=1 dft=2, dl=4
    assert(out((0L, 1L))._1 ===
      refScore(Seq((2L, 2L), (1L, 2L)), 4L, nDocs, avgdl))
    // query 0 on doc 2: apple tf=1, banana tf=3, dl=4
    assert(out((0L, 2L))._1 ===
      refScore(Seq((1L, 2L), (3L, 2L)), 4L, nDocs, avgdl))
    // query 1 on doc 3 only: dates tf=2 dft=1, dl=3
    assert(out((1L, 3L))._1 === refScore(Seq((2L, 1L)), 3L, nDocs, avgdl))
    assert(out((1L, 3L))._2 === 1L)
    // doc 4 matches nothing: absent everywhere
    assert(!out.keySet.exists(_._2 == 4L))
    // ranking: doc 2 (banana tf=3) beats doc 1 under query 0
    assert(out((0L, 2L))._2 === 1L && out((0L, 1L))._2 === 2L)
  }

  test("k truncates per query; repartition-invariant") {
    val corpus = (1L to 300L).map(i =>
      (i, Seq.fill((i % 5 + 1).toInt)("team").mkString(" ") + " filler" + i))
      .toDF("doc_id", "text")
    val qs = Seq((7L, "team")).toDF("query_id", "term")
    val a = Bm25.topK(corpus, $"doc_id", $"text", qs, k = 10)
    assert(a.count() === 10L)
    assert(a.groupBy("query_id").count().as[(Long, Long)].collect()
      .toMap === Map(7L -> 10L))
    val b = Bm25.topK(corpus.repartition(11), $"doc_id", $"text",
      qs.repartition(2), k = 10)
    assert(a.orderBy("query_id", "rank").collect().toSeq ===
      b.orderBy("query_id", "rank").collect().toSeq)
  }
}

package graft.multimodal

import graft.SparkSuite
import graft.gen.PageGen
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("binary media plumbing: schema, batching, deterministic features") {
    val pages = PageGen.pages(spark, 50, seed = 9L)
    val media = Multimodal.mediaFromPages(spark, pages)
    val feats = Multimodal.extractFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length === media.count())
    assert(rows.forall(_.features.length === 16))
    assert(rows.forall(_.n_bytes > 0))
    // deterministic across partitionings
    val feats2 = Multimodal.extractFeatures(
      media.repartition(7), dim = 16).collect()
    val a = rows.map(r => r.media_id -> r.checksum).toMap
    val b = feats2.map(r => r.media_id -> r.checksum).toMap
    assert(a === b)
    // histogram features are L1-normalized by construction
    assert(rows.forall(r => math.abs(r.features.sum - 1.0f) < 1e-3))
  }

  test("sample-offset planning is a pure column expression") {
    val df = Seq((1L, 1000L), (2L, 0L)).toDF("id", "dur")
      .select($"id", Multimodal.sampleOffsets($"dur", 250L).as("offsets"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(df(1L) === Seq(0L, 250L, 500L, 750L))
    assert(df(2L) === Seq(0L))
  }
}

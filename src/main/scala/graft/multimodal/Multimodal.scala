package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators for a training-data pipeline: media travel
 * as opaque `binary` columns with typed metadata; decode / feature
 * extraction runs partition-batched on executors.
 *
 * The container has no image/audio codecs, so the DECODE step is a
 * clearly-marked deterministic stub (`stubDecode`); everything around it —
 * schema, partition batching, per-batch state amortization, output shape —
 * is the real distributed plumbing and is tested. Swapping in a real codec
 * means replacing the body of `stubDecode` only.
 */
object Multimodal {

  /** Typed metadata for an opaque media payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, features: Array[Float])

  /** Deterministic fake decode: byte histogram folded to `dim` float
    * features + a content checksum. STUB — stands in for a real
    * image/audio decoder (none available in this container). */
  def stubDecode(payload: Array[Byte], dim: Int): (Long, Array[Float]) = {
    val f = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      f(b % dim) += 1.0f
      h = 31 * h + b
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < dim) { f(j) /= payload.length; j += 1 }
    }
    (h, f)
  }

  /** Feature extraction over a media table: partition-batched map keeping
    * per-partition decoder state (`init` once per partition — where a real
    * codec/model handle would live), executor-parallel, no shuffle. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init: real impl loads codec / model weights here
      val decoderReady = true
      rows.map { r =>
        require(decoderReady)
        val (checksum, feats) = stubDecode(r.payload, dim)
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong,
          checksum, feats)
      }
    }
  }

  /** Frame/window sampling plan for time-media: deterministic sample
    * offsets as a column expression (no decode needed for planning). */
  def sampleOffsets(durationMs: org.apache.spark.sql.Column, everyMs: Long)
      : org.apache.spark.sql.Column =
    sequence(lit(0L), greatest(durationMs - 1, lit(0L)), lit(everyMs))

  /** Synthetic media table derived from the page corpus html payloads
    * (binary column exercise; deterministic). */
  def mediaFromPages(spark: SparkSession, pages: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    pages.select(
        xxhash64(col("url")).as("media_id"),
        col("html").as("payload"))
      .withColumn("meta", struct(
        lit("image").as("kind"),
        (pmod(xxhash64(col("media_id")), lit(1024)) + 64).cast(IntegerType).as("width"),
        (pmod(xxhash64(col("media_id"), lit(1)), lit(768)) + 64).cast(IntegerType).as("height"),
        lit(0).as("sampleRateHz"),
        lit(0L).as("durationMs")))
      .as[MediaRow]
  }
}

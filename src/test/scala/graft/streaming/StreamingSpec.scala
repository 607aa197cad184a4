package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._

/**
 * Structured Streaming capability check (SURVEY.md §2.9: the reference is
 * batch-only; the rebuild's ingestion path maps to readStream + watermark
 * + windowed aggregation over the same events schema).
 */
class StreamingSpec extends SparkSuite {

  test("windowed streaming aggregation over events parquet") {
    val dir = "/root/testdata/sf0.001"
    // the file-stream source needs a directory to watch
    val streamDir = java.nio.file.Files.createTempDirectory("ev-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      // parquet stores TIMESTAMP_NTZ; event-time needs TIMESTAMP (LTZ)
      .withColumn("ts", col("ts").cast("timestamp"))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ev_agg").start()
    try {
      q.processAllAvailable()
      val out = spark.table("ev_agg")
      assert(out.count() > 0)
      val total = out.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total === spark.read.parquet(s"$dir/events.parquet").count())
    } finally q.stop()
  }
}

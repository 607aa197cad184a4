package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingOpsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming dedup drops duplicate keys within the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "doc_id", "text")
    val dedup = Streaming.streamingDedup(df, "ts", Seq("doc_id"))
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(
        (ts("2026-01-01 10:00:00"), 1L, "a"),
        (ts("2026-01-01 10:00:00"), 1L, "a-dup"),
        (ts("2026-01-01 10:01:00"), 2L, "b"))
      q.processAllAvailable()
      in.addData((ts("2026-01-01 10:00:00"), 1L, "a-again"),
        // re-ingest of key 2 with a DIFFERENT event time (the common
        // replay case) must also be dropped: dedup is per key, not per
        // (key, ts)
        (ts("2026-01-01 10:03:00"), 2L, "b-replayed"),
        (ts("2026-01-01 10:02:00"), 3L, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().sorted
      assert(out === Array(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming ER ingest matches new pages to their planted corpus entity") {
    implicit val sq = spark.sqlContext
    import graft.pipeline.ERPipeline
    import graft.gen.PageGen
    val cfg = ERPipeline.Config() // default DF-stoplist: the stream side
                                  // must consume the SAME list block() used
    val truth = PageGen.pagesWithTruth(spark, 40, seed = 31L)
      .select("url", "entity_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = PageGen.pages(spark, 40, seed = 31L)
    val cex = ERPipeline.extract(corpus).localCheckpoint()
    val stop = ERPipeline.tokenStoplist(cex, cfg, Some(cex.count()))
    val cblocked = ERPipeline.block(cex, cfg, Some(cex.count())).localCheckpoint()
    val idToUrl = cex.select("id", "url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    // "newly crawled" pages: a slice of the same generated crawl, streamed
    val newRows = corpus.select("url", "text").collect().take(12)
      .map(r => (ts("2026-01-01 10:00:00"), r.getString(0), r.getString(1)))
    val in = MemoryStream[(java.sql.Timestamp, String, String)]
    val stream = in.toDF().toDF("ts", "url", "text")
    val matches = Streaming.streamingMatches(stream, cex, cblocked,
      stopTokens = stop, cfg = cfg)
    val q = matches.writeStream.format("memory").queryName("er_stream_out")
      .outputMode("append").start()
    try {
      in.addData(newRows.take(6).toSeq)
      q.processAllAvailable()
      in.addData(newRows.drop(6).toSeq)
      q.processAllAvailable()
      val out = spark.table("er_stream_out")
        .select("l_url", "r_id").collect()
        .map(r => (r.getString(0), idToUrl(r.getLong(1))))
      assert(out.nonEmpty)
      // precision: no match may cross planted entities
      out.foreach { case (lUrl, rUrl) =>
        assert(truth(lUrl) === truth(rUrl), s"cross-entity match $lUrl ~ $rUrl")
      }
      // recall: every streamed page with a same-entity sibling in the
      // corpus must match at least one of them
      val matchedL = out.map(_._1).toSet
      newRows.map(_._2).foreach { url =>
        val siblings = truth.count { case (u, e) => e == truth(url) && u != url }
        if (siblings > 0)
          assert(matchedL.contains(url), s"streamed page $url found no sibling")
      }
    } finally q.stop()
  }

  test("capCorpusBlocks bounds hot static blocks deterministically, drops surfaced") {
    val corpus = Seq((10L, 7L), (11L, 7L), (12L, 7L), (13L, 8L))
      .toDF("id", "block_key")
    val (capped, drops) = Streaming.capCorpusBlocks(corpus, cap = 2)
    val kept = capped.select("block_key", "id").as[(Long, Long)]
      .collect().toSet
    // lowest ids win within the hot block; the cold block is untouched
    assert(kept === Set((7L, 10L), (7L, 11L), (8L, 13L)))
    val d = drops.collect().map(r => (r.getAs[Long]("block_key"),
      r.getAs[Long]("n_total"), r.getAs[Long]("n_dropped")))
    assert(d.toSeq === Seq((7L, 3L, 1L)))
  }

  test("streaming ER ingest: file source + checkpoint restart, no re-emission") {
    // the streaming twin of PipelineAppSpec's resume test: drive
    // streamingMatches from a real file-source directory with a durable
    // checkpoint + file sink, stop the query between batches, restart it
    // with the same checkpoint, and assert the restarted query (a) does
    // not re-emit batch-1 matches and (b) still processes new files.
    import graft.pipeline.ERPipeline
    import graft.gen.PageGen
    import org.apache.spark.sql.types._
    val cfg = ERPipeline.Config()
    val truth = PageGen.pagesWithTruth(spark, 40, seed = 31L)
      .select("url", "entity_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = PageGen.pages(spark, 40, seed = 31L)
    val cex = ERPipeline.extract(corpus).localCheckpoint()
    val stop = ERPipeline.tokenStoplist(cex, cfg, Some(cex.count()))
    val cblocked = ERPipeline.block(cex, cfg, Some(cex.count())).localCheckpoint()
    val idToUrl = cex.select("id", "url").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val root = java.nio.file.Files.createTempDirectory("er-stream-files")
    val srcDir = s"$root/in"; val sinkDir = s"$root/out"
    val ckptDir = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    val newRows = corpus.select("url", "text").collect().take(12)
      .map(r => (ts("2026-01-01 10:00:00"), r.getString(0), r.getString(1)))
    def writeBatch(name: String, rows: Seq[(java.sql.Timestamp, String, String)]) =
      rows.toDF("ts", "url", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/$name")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("url", StringType), StructField("text", StringType)))
    def startQuery() = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$srcDir/*")
      Streaming.streamingMatches(stream, cex, cblocked,
          stopTokens = stop, cfg = cfg)
        .writeStream.format("parquet")
        .option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append").start()
    }

    writeBatch("b1", newRows.take(6).toIndexedSeq)
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    val afterB1 = spark.read.parquet(sinkDir)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    assert(afterB1.nonEmpty)

    // stop happened between micro-batches; new data arrives while down
    writeBatch("b2", newRows.drop(6).toIndexedSeq)
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()

    val out = spark.read.parquet(sinkDir)
      .select("l_url", "l_id", "r_id").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    // exactly-once across the restart: batch-1 pairs appear exactly once
    val pairCounts = out.map(_._2).groupBy(identity).map(_._2.length)
    assert(pairCounts.forall(_ == 1), "restart re-emitted matches")
    assert(afterB1.toSet.subsetOf(out.map(_._2).toSet))
    // the restarted query made progress on the new file
    val matchedL = out.map(_._1).toSet
    newRows.map(_._2).foreach { url =>
      val siblings = truth.count { case (u, e) => e == truth(url) && u != url }
      if (siblings > 0)
        assert(matchedL.contains(url), s"streamed page $url found no sibling")
    }
    // precision across both batches: no cross-entity match
    out.foreach { case (lUrl, (_, rId)) =>
      assert(truth(lUrl) === truth(idToUrl(rId)), s"cross-entity $lUrl")
    }
  }

  test("entity profile state is evicted after the event-time ttl") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streaming.PageEvent]
    val profiles = Streaming.entityProfiles(in.toDS(),
      lateness = "10 minutes", stateTtl = "1 hour")
    val q = profiles.writeStream.format("memory").queryName("profiles_ttl")
      .outputMode("append").start()
    try {
      // batch 1: entity 7 and the watermark-driver entity 99
      in.addData(
        Streaming.PageEvent(7L, "https://a/1", "Acer Aspire 5",
          ts("2026-01-01 09:00:00")),
        Streaming.PageEvent(99L, "https://w/1", "tick",
          ts("2026-01-01 09:00:00")))
      q.processAllAvailable()
      // batch 2 advances the watermark to 12:50 (> 7's 10:00 timeout) …
      in.addData(Streaming.PageEvent(99L, "https://w/2", "tick",
        ts("2026-01-01 13:00:00")))
      q.processAllAvailable()
      // … batch 3 runs timeout processing with that watermark: 7 evicted
      in.addData(Streaming.PageEvent(99L, "https://w/3", "tick",
        ts("2026-01-01 13:01:00")))
      q.processAllAvailable()
      // batch 4: entity 7 re-appears — state was removed, profile restarts
      in.addData(Streaming.PageEvent(7L, "https://a/2", "Acer Aspire 5",
        ts("2026-01-01 13:30:00")))
      q.processAllAvailable()
      val rows7 = spark.table("profiles_ttl")
        .where(col("entity_key") === 7L)
        .orderBy("last_seen").as[Streaming.EntityProfile].collect()
      assert(rows7.length === 2)
      assert(rows7.last.n_pages === 1L)           // fresh state, not 2
      assert(rows7.last.first_seen === ts("2026-01-01 13:30:00"))
    } finally q.stop()
  }

  test("entity profiles accumulate state across batches (flatMapGroupsWithState)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streaming.PageEvent]
    val profiles = Streaming.entityProfiles(in.toDS())
    val q = profiles.writeStream.format("memory").queryName("profiles_out")
      .outputMode("append").start()
    try {
      in.addData(
        Streaming.PageEvent(7L, "https://a/1", "Acer Aspire 5",
          ts("2026-01-01 09:00:00")),
        Streaming.PageEvent(7L, "https://b/1", "acer aspire 5",
          ts("2026-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(Streaming.PageEvent(7L, "https://c/1", "Aspire 5 Acer",
        ts("2026-01-01 11:00:00")))
      q.processAllAvailable()
      val rows = spark.table("profiles_out")
        .orderBy("n_pages").as[Streaming.EntityProfile].collect()
      assert(rows.length === 2)                 // one emission per batch
      val last = rows.last
      assert(last.n_pages === 3L)               // state carried across batches
      assert(last.first_seen === ts("2026-01-01 09:00:00"))
      assert(last.last_seen === ts("2026-01-01 11:00:00"))
      // token-set fingerprint is order/case-insensitive: all three titles
      // share it (same normalized token set)
      assert(rows.head.title_fp === last.title_fp)
    } finally q.stop()
  }

  test("streaming daily agg matches the batch q9 aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("ev2-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = Streaming.dailyEventAgg(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("daily_agg").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("daily_agg")
        .agg(sum("n_events"), round(sum("sum_value"), 4)).collect()(0)
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .agg(count(lit(1)), round(sum(col("value").cast("decimal(18,4)"))
          .cast("double"), 4)).collect()(0)
      assert(streamed.getLong(0) === batch.getLong(0))
      assert(streamed.getDouble(1) === batch.getDouble(1))
    } finally q.stop()
  }
}

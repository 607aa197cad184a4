package graft.app

import org.apache.spark.sql.SparkSession
import graft.pipeline.ERPipeline
import graft.gen.PageGen

/** Stage-by-stage wall-clock profile of the ER pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("prof").toString)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }

    val cfg = ERPipeline.Config()
    val pages = time("gen+count") {
      val p = PageGen.pages(spark, n, 42L).localCheckpoint()
      println(s"[profile]   pages=${p.count()}"); p
    }
    val ex = time("extract") {
      val e = ERPipeline.extract(pages).localCheckpoint()
      println(s"[profile]   extracted=${e.count()}"); e
    }
    val blocked = time("block") {
      val b = ERPipeline.block(ex, cfg).localCheckpoint()
      println(s"[profile]   blocked=${b.count()}"); b
    }
    val blockSizes = time("block-size-histogram") {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      blocked.groupBy($"block_key").count()
        .agg(max($"count"), expr("percentile_approx(count, 0.99)"),
          count(lit(1))).collect()(0)
    }
    println(s"[profile]   max_block/p99/n_blocks=$blockSizes")
    // sub-steps of the score stage
    import org.apache.spark.sql.functions.col
    val slim = blocked.select(col("block_key"), col("id"), col("token_fp"))
    val capped = time("  split-oversized") {
      val (c, _) = graft.block.Blocking.splitOversizedBlocks(
        slim, "block_key", "token_fp", cfg.pairCapPerBlock)
      val cc = c.localCheckpoint(); cc.count(); cc
    }
    val idPairs = time("  idpair-join+dedup") {
      val p = graft.block.Blocking
        .candidatePairs(capped, "block_key", "id", Nil)
        .select(col("l_id"), col("r_id")).localCheckpoint()
      println(s"[profile]   idPairs=${p.count()}"); p
    }
    val scored = time("score (full)") {
      val (s, _) = ERPipeline.scorePairs(ex, blocked, cfg)
      val sc = s.localCheckpoint()
      println(s"[profile]   pairs=${sc.count()}"); sc
    }
    val comps = time("cluster") {
      val c = ERPipeline.cluster(spark, scored, cfg)
      println(s"[profile]   nodes=${c.count()}"); c
    }
    spark.stop()
  }
}

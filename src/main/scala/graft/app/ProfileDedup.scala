package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.block.Blocking
import graft.dedup.Dedup

/** Stage-by-stage profile of the MinHash near-dup operator (dev tool). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").localCheckpoint()
    println(s"[profile] docs=${docs.count()}")
    val base = time("shingles") {
      val b = docs.select(col("doc_id").as("id"),
        Dedup.wordShingles(col("text")).as("sh"))
        .withColumn("fp", Blocking.tokenFingerprint(col("sh")))
        .localCheckpoint()
      println(s"[profile]   rows=${b.count()}"); b
    }
    val blocked = time("band keys") {
      val bl = Blocking.minhashBlocks(
        base.select(col("id"), col("fp"), col("sh").as("tokens")),
        col("tokens"), 8, 4).select("block_key", "id", "fp").localCheckpoint()
      println(s"[profile]   rows=${bl.count()}"); bl
    }
    val split = time("split blocks") {
      val (s, stats) = Blocking.splitOversizedBlocks(blocked, "block_key", "fp", 500)
      val sc = s.localCheckpoint()
      println(s"[profile]   rows=${sc.count()} splitBlocks=${stats.count()}"); sc
    }
    val pairs = time("candidate pairs") {
      val p = Blocking.candidatePairs(split, "block_key", "id", Nil)
        .select(col("l_id"), col("r_id")).localCheckpoint()
      println(s"[profile]   pairs=${p.count()}"); p
    }
    time("verify jaccard") {
      val sh = base.select(col("id"), col("sh"))
      val v = pairs
        .join(sh.toDF("l_id", "l_sh"), Seq("l_id"))
        .join(sh.toDF("r_id", "r_sh"), Seq("r_id"))
        .select(col("l_id"), col("r_id"),
          graft.score.Similarity.jaccard(col("l_sh"), col("r_sh")).as("jaccard"))
        .where(col("jaccard") >= 0.7)
      println(s"[profile]   verified=${v.count()}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line, per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries are materialized with count() (forces the
  * full plan; results themselves are checked by graft.Verify). */
object Bench {

  /** Scratch dir for shuffle/spill files: prefer RAM-backed /dev/shm when
    * present (this sandbox's root fs mounts with `discard`, making Spark's
    * many-small-shuffle-file churn synchronously TRIM on every unlink; a
    * real cluster executor writes shuffle to fast local SSD). An explicit
    * -Dspark.local.dir always wins. */
  private[graft] def localDir: String =
    sys.props.get("spark.local.dir").getOrElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-spark-local")
        d.mkdirs()
        d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString)
    // Warmup: initialize codegen/Janino, parquet IO, shuffle machinery and
    // the UDF classloading paths once, so the alphabetically-first query
    // doesn't absorb JVM cold-start into its measurement.
    locally {
      import org.apache.spark.sql.functions._
      val tmp = java.nio.file.Files.createTempDirectory("graft-warm").toString
      val w = spark.range(10000).toDF("id")
        .withColumn("s", concat(lit("COL title VAL w"), col("id")))
      w.groupBy(pmod(col("id"), lit(7))).count().count()
      w.write.mode("overwrite").parquet(s"$tmp/w")
      graft.convert.DittoConverter.convertLines(spark,
        spark.read.parquet(s"$tmp/w")
          .select(concat(col("s"), lit("\tCOL title VAL x\t1")).as("value"))
          .limit(50),
        graft.convert.DittoConverter.Config()).count()
    }
    // Noise robustness: this shared VM has host-contention phases that can
    // inflate a single measurement ~20× (BENCH_r03's convert_ditto: 172 s
    // recorded vs 9 s reproduced — see BENCH/BASELINE.md). Each query runs
    // `reps` times; the reported figure is the MIN (the least-contended
    // run; work is deterministic, so min is the honest hardware number)
    // and `spread` records max-min per query so a noisy round is visible
    // in the artifact itself instead of rewriting history.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q1_agg,er_clusters times just
    // those queries. The driver never sets it; the artifact of record is
    // always the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) =>
        val unknown = names -- SparkEntry.queries.keySet
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names unknown queries: " +
            s"${unknown.toSeq.sorted.mkString(", ")}")
        SparkEntry.queries.filter(q => names(q._1))
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        // A failed query must read as a FAILURE, not as a fast run.
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(160))
        }
        r += 1
      }
      (name, times.toSeq, err)
    }
    val qs = results.map {
      case (k, ts, None) => "\"" + k + f"""":${ts.min}%.3f"""
      case (k, _, Some(e)) => "\"" + k + "\":\"ERR: " + e + "\""
    }.mkString("{", ",", "}")
    val spread = results.collect { case (k, ts, None) =>
      "\"" + k + f"""":${ts.max - ts.min}%.3f"""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts, None) => ts.min }.sum
    val nErr = results.count(_._3.isDefined)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","errors":$nErr,"reps":$reps,"queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Scaling-evidence harness (BENCH/BASELINE.md): run the full ER pipeline
  * over a generated corpus at two parallelism levels — the sandbox
  * stand-in for N vs 4N executors (no real cluster here). Prints one JSON
  * line per level plus an efficiency line.
  *
  * The CANONICAL protocol is `bench/scale_pinned.sh`: one JVM per level,
  * pinned with `taskset` to exactly N cores and a fixed 16g heap, so the
  * small "cluster" cannot borrow the idle cores for GC/JIT/IO threads
  * (unpinned `local[8]` on a 32-core box measures an 8-task-thread job
  * with 32-core JVM services — which understates or distorts true
  * scaling). Single-level mode (`<entities> <cpus> <reps>`) is what the
  * script invokes; two-level mode remains for quick unpinned smoke runs:
  *
  *   sbt "runMain graft.ScaleBench <entities> [cpusA,cpusB] [reps]"
  */
object ScaleBench {

  /** `cpus` = total executor cores at this level. The master defaults to
    * in-process local[cpus]; SPARK_GRAFT_MASTER overrides it so
    * bench/scale_cluster.sh can point the SAME measured job at a real
    * standalone master with N or 4N separate pinned executor JVMs — the
    * faithful emulation of the north rule's N-vs-4N EXECUTOR criterion
    * (scale-out adds heaps together with cores; one shared local-mode heap
    * under-provisions the wide level 4x and reads as fake GC inefficiency). */
  private def session(cpus: Int) = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", (cpus *
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_MULT", "2").toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Measurement hygiene for the standalone-cluster path (no-ops under
      // local[n]): start only once every executor is registered (else the
      // wide level begins scoring on 1 of 4 executors), and don't hold
      // tasks for locality on localCheckpoint'd blocks.
      .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Bench.localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-scale-ckpt").toString)
    spark
  }

  /** Per-run telemetry listener: total task wall time and in-task JVM GC
    * time over the measured window. Lets a scaling reading attribute its
    * efficiency loss — utilization drop (task_sec / (wall × cores) falls
    * at the wide level → driver/scheduler serial fraction), task-time
    * inflation (task_sec itself grows with cores on fixed work → shared
    * memory-bandwidth ceiling), or GC share (allocation pressure). */
  private final class TaskTally extends org.apache.spark.scheduler.SparkListener {
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      if (e.taskMetrics != null) gcMs.addAndGet(e.taskMetrics.jvmGCTime)
    }
  }

  private final case class RunStats(pairs: Long, clusters: Long,
      tScore: Double, tCluster: Double, taskSec: Double, taskGcSec: Double) {
    def total: Double = tScore + tCluster
  }

  /** One full measured execution. Uses the AT-SCALE config: payload
    * broadcast disabled (a 10^12-doc corpus never broadcasts; the
    * shuffle-join path is both the honest target topology and the
    * parallel one — broadcast builds serialize on the driver and cap
    * scaling per Amdahl). */
  private def runOnce(spark: SparkSession, nEntities: Long): RunStats = {
    val cfg = graft.pipeline.ERPipeline.Config(payloadBroadcastMaxRows = 0L)
    val pages = graft.gen.PageGen.pages(spark, nEntities, seed = 42L)
      .localCheckpoint()
    pages.count()
    val tally = new TaskTally
    spark.sparkContext.addSparkListener(tally)
    try {
      val t0 = System.nanoTime()
      val ex = graft.pipeline.ERPipeline.extract(pages).localCheckpoint()
      val n = Some(ex.count())
      val blocked = graft.pipeline.ERPipeline.block(ex, cfg, n)
      val (scoredPlan, _) = graft.pipeline.ERPipeline.scorePairs(ex, blocked, cfg, n)
      val scored = scoredPlan
        .select(org.apache.spark.sql.functions.col("l_id"),
          org.apache.spark.sql.functions.col("r_id"),
          org.apache.spark.sql.functions.col("score"))
        .localCheckpoint()
      val nPairs = scored.count()
      val tScore = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val comps = graft.pipeline.ERPipeline.cluster(spark, scored, cfg)
      val nClusters = comps.select("component").distinct().count()
      val tCluster = (System.nanoTime() - t1) / 1e9
      RunStats(nPairs, nClusters, tScore, tCluster,
        tally.taskMs.get / 1e3, tally.gcMs.get / 1e3)
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  def main(args: Array[String]): Unit = {
    val nEntities = args.headOption.map(_.toLong).getOrElse(20000L)
    val levels = args.lift(1).getOrElse("8,32").split(",").map(_.trim.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // Warmup corpus size: JIT/codegen/classloading warm at ANY size, so
    // an interleaved protocol (bench/scale_interleaved.sh — one short JVM
    // per (level, rep) sample to keep host phases comparable across
    // levels) passes a small count here instead of paying a full-size
    // run per JVM.
    val warmupEntities = args.lift(3).map(_.toLong).getOrElse(nEntities)

    val best = scala.collection.mutable.Map.empty[Int, RunStats]
    (1 to reps).foreach { _ =>
      levels.foreach { cpus =>
        val sp = session(cpus)
        // JIT/codegen warmup INSIDE the measured application. Under
        // local[n] this is equivalent to a JVM-global warmup, but under a
        // standalone master each SparkSession is a new app whose executor
        // JVMs are spawned fresh — a warmup in a previous app warms JVMs
        // that are already dead when the measurement starts.
        runOnce(sp, warmupEntities)
        val r = runOnce(sp, nEntities)
        sp.stop()
        val cur = best.get(cpus)
        if (cur.isEmpty || r.total < cur.get.total) best(cpus) = r
      }
    }
    levels.foreach { cpus =>
      val r = best(cpus)
      val util = r.taskSec / (r.total * cpus)
      println(f"""{"cpus":$cpus,"entities":$nEntities,"candidate_pairs":${r.pairs},"clusters":${r.clusters},"score_sec":${r.tScore}%.2f,"cluster_sec":${r.tCluster}%.2f,"total_sec":${r.total}%.2f,"pairs_per_sec":${r.pairs / r.tScore}%.0f,"task_sec":${r.taskSec}%.2f,"task_gc_sec":${r.taskGcSec}%.2f,"cpu_util":$util%.3f}""")
    }
    if (levels.length == 2) {
      val (lo, hi) = (levels.min, levels.max)
      val sLo = best(lo).total
      val sHi = best(hi).total
      val eff = (sLo / sHi) / (hi.toDouble / lo)
      // candidate-pairs/sec efficiency on the scoring stage (the metric
      // BASELINE.json names) alongside end-to-end efficiency
      val thrLo = best(lo).pairs / best(lo).tScore
      val thrHi = best(hi).pairs / best(hi).tScore
      val effScore = (thrHi / thrLo) / (hi.toDouble / lo)
      println(f"""{"scaling":{"n_cpus":$lo,"xn_cpus":$hi,"total_sec_n":$sLo%.2f,"total_sec_xn":$sHi%.2f,"speedup":${sLo / sHi}%.2f,"efficiency":$eff%.2f,"pairs_per_sec_n":$thrLo%.0f,"pairs_per_sec_xn":$thrHi%.0f,"score_efficiency":$effScore%.2f}}""")
    }
  }
}

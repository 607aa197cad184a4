package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dedup.Dedup
import graft.io.Snapshots
import graft.text.{Decontaminate, Pii, Repetition}

/**
 * spark-submit entry for the full training-data CURATION pipeline — the
 * production consumer that chains the corpus operators end-to-end with
 * snapshot/resume semantics and per-stage audit stats (a curation run
 * that cannot say how many documents each stage removed, and why, is
 * unauditable at 100 TB):
 *
 *   pii_clean    PII redaction (+ per-type counts kept as audit columns)
 *   quality      repetition/quality filter (Gopher-style signal gates)
 *   exact_kept   exact dedup keepers (content-hash canonical rows)
 *   neardup_kept near-dup keepers (MinHash-LSH pairs → CC → one per cluster)
 *   decon_kept   train/eval n-gram decontamination (drop flagged docs)
 *   sample       consistent-hash stratified sample (the training cut)
 *   stats        one row per stage: rows in/out/dropped
 *
 * Each stage is a named parquet snapshot + manifest under
 * <workRoot>/_snapshots — a rerun resumes after the last complete stage;
 * delete a stage manifest to recompute from there. Every FILTERING
 * stage's row delta lands in the final stats table, so the whole run is
 * reproducible AND explainable from its artifacts alone.
 *
 *   spark-submit --class graft.app.CurationApp <jar> \
 *     <workRoot> --input <docsParquet> [--eval <evalParquet>]
 *
 * `--input` rows need (doc_id: long, text: string, lang: string); the
 * optional `--eval` table needs (text). Without `--eval` the
 * decontamination stage passes everything through (stats row records 0
 * drops) rather than silently skipping.
 */
object CurationApp {

  final case class Config(
      jaccardFloor: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      deconNgram: Int = 8,
      maxRepScore: Double = 0.5,
      minTokens: Long = 5L,
      sampleRates: Seq[(String, Double)] = Seq("en" -> 0.5),
      sampleDefaultRate: Double = 0.25)

  def main(args: Array[String]): Unit = {
    val workRoot = args.headOption.getOrElse("/tmp/graft-curation")
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val input = opt("--input").getOrElse(
      sys.error("CurationApp requires --input <docsParquet>"))
    val eval = opt("--eval")

    val spark = SparkSession.builder()
      .appName("graft-curation-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(s"$workRoot/_spark_ckpt")

    val stats = run(spark, workRoot, spark.read.parquet(input),
      eval.map(spark.read.parquet(_)))
    stats.show(truncate = false)
    spark.stop()
  }

  /** Returns the per-stage stats table: (stage, rows_in, rows_out,
    * rows_dropped) in pipeline order. */
  def run(spark: SparkSession, workRoot: String, docs: DataFrame,
      evalDocs: Option[DataFrame], cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def staged(name: String, in: => DataFrame)(f: DataFrame => DataFrame)
        : DataFrame = {
      val inDf = in
      val out = Snapshots.getOrCompute(spark, workRoot, name)(f(inDf))
      Snapshots.writeLineage(spark, out, workRoot, name)
      counts += ((name, inDf.count(), out.count()))
      out
    }

    // 1. PII scrub — row-preserving; audit counts ride along as columns
    val piiClean = staged("pii_clean", docs) { d =>
      Pii.redact(d, col("doc_id"), col("text"))
        .join(d.drop("text"), Seq("doc_id"))
        .withColumnRenamed("clean_text", "text")
    }

    // 2. quality gate: minimum length + repetition ceiling. Signals join
    // back by id so the corpus row stays intact (slim join, body never
    // in the aggregate).
    val quality = staged("quality", piiClean) { d =>
      val sig = Repetition.repetitionScore(
        Repetition.signals(d, col("doc_id"), col("text")))
        .select(col("doc_id"), col("n_tokens"), col("rep_score"))
      d.join(sig, Seq("doc_id"))
        .where(col("n_tokens") >= cfg.minTokens &&
          col("rep_score") <= cfg.maxRepScore)
        .drop("n_tokens", "rep_score")
    }

    // 3. exact dedup — keep the min-id representative per content hash
    val exactKept = staged("exact_kept", quality) { d =>
      Dedup.exactKeepers(d, col("text"), col("doc_id"))
    }

    // 4. near-dup dedup — pairs → connected components → keeper rows only
    val nearKept = staged("neardup_kept", exactKept) { d =>
      val pairs = Dedup.minhashPairs(d, col("doc_id"), col("text"),
        cfg.bands, cfg.rowsPerBand, cfg.jaccardFloor)
      val keepers = Dedup.nearDupKeepers(d, col("doc_id"), pairs)
        .where(col("doc_id") === col("keeper")).select("doc_id")
      d.join(keepers, Seq("doc_id"))
    }

    // 5. decontamination — anti-join the flagged set (eval side broadcast)
    val deconKept = staged("decon_kept", nearKept) { d =>
      evalDocs match {
        case Some(e) =>
          val flagged = Decontaminate.flagged(d, col("doc_id"), col("text"),
            e, col("text"), cfg.deconNgram)
          d.join(flagged.select("doc_id"), Seq("doc_id"), "left_anti")
        case None => d
      }
    }

    // 6. the training cut — consistent-hash membership (reproducible
    // under retries and across runs; re-sampling a re-run is a no-op)
    val sampled = staged("sample", deconKept) { d =>
      graft.ops.Sampling.stratifiedSampleByKey(d, col("lang"),
        col("doc_id"), cfg.sampleRates, cfg.sampleDefaultRate)
    }
    sampled.count() // materialize the terminal stage before stats commit

    val stats = counts.toSeq.toDF("stage", "rows_in", "rows_out")
      .withColumn("rows_dropped", col("rows_in") - col("rows_out"))
    Snapshots.commit(spark, stats, workRoot, "stats")
    stats
  }
}

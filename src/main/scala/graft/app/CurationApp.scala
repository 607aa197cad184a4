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
 *   packed       sequence-packing assembly plan (doc sub-span → fixed-
 *                length training sequence; an expansion stage)
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
      minChars: Long = 20L,
      sampleRates: Seq[(String, Double)] = Seq("en" -> 0.5),
      sampleDefaultRate: Double = 0.25,
      packSeqLen: Int = 2048,
      packShards: Int = 64)

  def main(args: Array[String]): Unit = {
    val workRoot = args.headOption.getOrElse("/tmp/graft-curation")
    require(!workRoot.startsWith("--"),
      s"first argument is the workRoot, got flag-like '$workRoot' — " +
        "usage: CurationApp <workRoot> --input <docsParquet> [--eval <p>]")
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val input = opt("--input").getOrElse(
      sys.error("CurationApp requires --input <docsParquet>"))
    require(!input.startsWith("--"),
      s"--input is followed by another flag ('$input'), not a path")
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
    // Stats describe the run that PRODUCED each snapshot: when a stage is
    // computed, its rows in/out are counted and sealed into the stage
    // manifest; when a stage is RESUMED, they are read back from that
    // manifest — never recomputed against the current (possibly
    // different) input, which would fabricate audit numbers describing
    // no run that ever happened.
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    def staged(name: String, in: => DataFrame)(f: DataFrame => DataFrame)
        : DataFrame = {
      val resumed = Snapshots.isComplete(workRoot, name)
      lazy val inDf = in
      val out = Snapshots.getOrCompute(spark, workRoot, name,
        extra = Map("rows_in" -> inDf.count().toString))(f(inDf))
      if (!resumed) Snapshots.writeLineage(spark, out, workRoot, name)
      val rowsIn = Snapshots.manifestField(workRoot, name, "rows_in")
        .map(_.toLong).getOrElse(0L)
      val rowsOut = Snapshots.manifestField(workRoot, name, "rows")
        .map(_.toLong).getOrElse(0L)
      counts += ((name, rowsIn, rowsOut))
      out
    }

    // 1. PII scrub — row-preserving; audit counts ride along as columns
    val piiClean = staged("pii_clean", docs) { d =>
      Pii.redact(d, col("doc_id"), col("text"))
        .join(d.drop("text"), Seq("doc_id"))
        .withColumnRenamed("clean_text", "text")
    }

    // 2. quality gate: SCRIPT-NEUTRAL length floor (chars, not Latin
    // tokens — a zh/ru doc must not die because the tokenizer can't see
    // it) + repetition ceiling. Signals left-join back by id with a
    // benign default (no gram evidence -> rep_score 0), so token-less
    // docs pass through to script-appropriate downstream gates instead
    // of being silently misattributed to "quality".
    val quality = staged("quality", piiClean) { d =>
      val sig = Repetition.repetitionScore(
        Repetition.signals(d, col("doc_id"), col("text")))
        .select(col("doc_id"), col("rep_score"))
      d.join(sig, Seq("doc_id"), "left")
        .where(length(col("text")) >= cfg.minChars &&
          coalesce(col("rep_score"), lit(0.0)) <= cfg.maxRepScore)
        .drop("rep_score")
    }

    // 3. exact dedup — keep the min-id representative per content hash
    val exactKept = staged("exact_kept", quality) { d =>
      Dedup.exactKeepers(d, col("text"), col("doc_id"))
    }

    // 4. near-dup dedup — pairs → connected components → keeper rows only
    val nearKept = staged("neardup_kept", exactKept) { d =>
      // reliable checkpoint() (not the localCheckpoint default) for the
      // shingled/banded intermediates: a lost executor replays from
      // checkpoint storage instead of failing on unrecoverable local
      // blocks — same choice PipelineApp makes for CC round state
      val pairs = Dedup.minhashPairs(d, col("doc_id"), col("text"),
        cfg.bands, cfg.rowsPerBand, cfg.jaccardFloor,
        persist = _.checkpoint())
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

    // 7. training layout — the sequence-packing assembly plan (which doc
    // sub-span lands in which fixed-length training sequence). An
    // EXPANSION stage: rows_out counts (doc, sequence) assembly rows, so
    // its stats rows_dropped is negative by design — the audit contract
    // is rows in/out per stage, not monotone shrinkage. Cost unit is
    // chars (script-neutral, like the quality floor).
    staged("packed", sampled) { d =>
      graft.ops.Packing.packSequences(d, col("doc_id"), length(col("text")),
          cfg.packSeqLen, cfg.packShards)
        .withColumnRenamed("k", "doc_id")
    }

    val stats = counts.toSeq.toDF("stage", "rows_in", "rows_out")
      .withColumn("rows_dropped", col("rows_in") - col("rows_out"))
    Snapshots.commit(spark, stats, workRoot, "stats")
    stats
  }
}

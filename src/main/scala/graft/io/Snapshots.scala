package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/**
 * Snapshot / lineage convention over partitioned Parquet (SURVEY.md §7
 * header: no Iceberg runtime jar ships with the image, so the north-rule's
 * "Iceberg table + snapshot checkpoints" is realized as Parquet stage
 * tables plus an explicit `_snapshots/<stage>/` manifest directory giving
 * the same observable semantics: named snapshots, commit atomicity via
 * manifest-last writes, per-stage lineage + metrics, and resume-from-last-
 * complete-stage).
 *
 * Layout:  <root>/<stage>/           parquet data
 *          <root>/_snapshots/<stage>.json   manifest (written last = commit)
 */
object Snapshots {

  case class Manifest(stage: String, rows: Long, schemaJson: String,
      wallMs: Long, extra: Map[String, String])

  private def manifestPath(root: String, stage: String): Path =
    Paths.get(root, "_snapshots", s"$stage.json")

  def isComplete(root: String, stage: String): Boolean =
    Files.exists(manifestPath(root, stage))

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Write stage output + manifest; returns the re-read DataFrame so the
    * downstream plan reads from the snapshot (lineage cut, resumable). */
  def commit(spark: SparkSession, df: DataFrame, root: String, stage: String,
      partitionBy: Seq[String] = Nil, extra: Map[String, String] = Map.empty)
      : DataFrame = {
    val t0 = System.nanoTime()
    val dataPath = s"$root/$stage"
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dataPath)
    val out = spark.read.parquet(dataPath)
    val rows = out.count()
    val wallMs = (System.nanoTime() - t0) / 1000000
    val fields = Map(
      "stage" -> s""""${esc(stage)}"""",
      "rows" -> rows.toString,
      "wall_ms" -> wallMs.toString,
      "schema" -> s""""${esc(df.schema.simpleString)}"""") ++
      extra.map { case (k, v) => k -> s""""${esc(v)}"""" }
    val json = fields.map { case (k, v) => s""""${esc(k)}": $v""" }
      .mkString("{", ", ", "}")
    Files.createDirectories(manifestPath(root, stage).getParent)
    Files.writeString(manifestPath(root, stage), json)
    out
  }

  /** Resume: return the snapshot if complete, else compute+commit it. */
  def getOrCompute(spark: SparkSession, root: String, stage: String,
      partitionBy: Seq[String] = Nil)(compute: => DataFrame): DataFrame =
    if (isComplete(root, stage)) spark.read.parquet(s"$root/$stage")
    else commit(spark, compute, root, stage, partitionBy)

  /** Per-partition lineage rows for a stage output: one row per Spark
    * partition with row counts — appended to <root>/_lineage. */
  def writeLineage(spark: SparkSession, df: DataFrame, root: String,
      stage: String): Unit = {
    import spark.implicits._
    val lin = df.withColumn("_pid", spark_partition_id())
      .groupBy($"_pid").agg(count(lit(1)).as("rows"))
      .withColumn("stage", lit(stage))
    lin.write.mode("append").parquet(s"$root/_lineage")
  }

  def listSnapshots(root: String): Seq[String] = {
    val dir = Paths.get(root, "_snapshots")
    if (!Files.exists(dir)) Nil
    else Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).toSeq.sorted
  }
}

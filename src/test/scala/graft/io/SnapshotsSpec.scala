package graft.io

import graft.SparkSuite
import java.nio.file.Files

class SnapshotsSpec extends SparkSuite {
  import spark.implicits._

  test("commit writes data + manifest; getOrCompute resumes without recompute") {
    val root = Files.createTempDirectory("snap").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Snapshots.commit(spark, df, root, "stage1")
    assert(Snapshots.isComplete(root, "stage1"))
    assert(Snapshots.listSnapshots(root) === Seq("stage1"))

    var recomputed = false
    val out = Snapshots.getOrCompute(spark, root, "stage1") {
      recomputed = true; df
    }
    assert(!recomputed, "resume must not recompute a committed stage")
    assert(out.count() === 2)

    val out2 = Snapshots.getOrCompute(spark, root, "stage2") {
      recomputed = true; df.withColumn("w", $"id" * 2)
    }
    assert(recomputed && out2.columns.contains("w"))
    assert(Snapshots.listSnapshots(root) === Seq("stage1", "stage2"))
  }

  test("lineage rows record per-partition counts") {
    val root = Files.createTempDirectory("snap2").toString
    val df = spark.range(100).toDF("id").repartition(4)
    Snapshots.writeLineage(spark, df, root, "s")
    val lin = spark.read.parquet(s"$root/_lineage")
    assert(lin.count() === 4)
    assert(lin.selectExpr("sum(rows)").as[Long].collect()(0) === 100L)
  }
}

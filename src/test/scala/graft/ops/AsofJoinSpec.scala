package graft.ops

import graft.SparkSuite
import java.sql.Timestamp

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("asofBackward: latest prior payload per key, inclusive bound, null when none") {
    val left = Seq(
      (100L, 1L, ts(50)),  // after right rows at 10 and 30 -> picks 30
      (101L, 1L, ts(30)),  // EXACTLY at a right ts -> inclusive, picks 30
      (102L, 1L, ts(5)),   // before any right row -> null
      (103L, 2L, ts(50)),  // other key: only key-2 rows visible
      (104L, 3L, ts(50))   // key with no right rows at all -> null
    ).toDF("click_id", "user_id", "t")
    val right = Seq(
      (900L, 1L, ts(10), 1.0),
      (901L, 1L, ts(30), 2.0),
      (902L, 1L, ts(40), 3.0), // after clicks 101/102, before 100? 40<50 -> 100 picks this
      (903L, 2L, ts(20), 4.0)
    ).toDF("view_id", "user_id", "t", "v")

    val out = AsofJoin.asofBackward(left, right, Seq("user_id"), "t", "t",
        payload = Seq("view_id", "v"))
      .select($"click_id", $"asof_view_id", $"asof_v")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap

    assert(out(100L) === ((Some(902L), Some(3.0))))
    assert(out(101L) === ((Some(901L), Some(2.0))))
    assert(out(102L) === ((None, None)))
    assert(out(103L) === ((Some(903L), Some(4.0))))
    assert(out(104L) === ((None, None)))
  }

  test("asofBackward preserves all left columns and is parallelism-invariant") {
    val left = (0L until 40L).map(i => (i, i % 4, ts(i), s"x$i"))
      .toDF("id", "k", "t", "tag")
    val right = (0L until 20L).map(i => (1000L + i, i % 4, ts(i * 2), i * 1.5))
      .toDF("rid", "k", "t", "v")
    val a = AsofJoin.asofBackward(left, right, Seq("k"), "t", "t", Seq("rid", "v"))
    assert(a.columns.toSeq === Seq("id", "k", "t", "tag", "asof_rid", "asof_v"))
    val one = AsofJoin.asofBackward(left.repartition(1), right.repartition(7),
      Seq("k"), "t", "t", Seq("rid", "v"))
    assert(a.orderBy("id").collect().toSeq === one.orderBy("id").collect().toSeq)
  }
}

package graft

import graft.operators.TableOps
import org.apache.spark.sql.functions._

class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val nw = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val out = TableOps.snapshotDiff(old, nw, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff is exact on nulls (null-safe struct compare)") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val out = TableOps.snapshotDiff(old, nw, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // null == null is UNCHANGED (dropped); value -> null is CHANGED
    assert(out == Seq((2L, "changed")))
  }

  test("snapshotDiff rejects mismatched schemas and missing keys") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 2L)).toDF("k", "s", "extra")
    intercept[IllegalArgumentException](TableOps.snapshotDiff(a, b, "k"))
    intercept[IllegalArgumentException](TableOps.snapshotDiff(a, a, "nope"))
  }
}

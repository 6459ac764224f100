package graft

import org.apache.spark.sql.functions.col

import graft.operators.PrefixSum

/** The distributed prefix sum replaces partitionless running-total windows
  * (q47's pack). Driver-side state is O(parts) offsets — never row data. */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(23L)

  test("exclusive running total matches brute force, any partition count") {
    val data = Seq.fill(307)((rng.nextInt(100000).toLong, rng.nextInt(50).toLong))
      .zipWithIndex.map { case ((k, v), i) => (k * 1000 + i, v) } // unique keys
    var run = 0L
    val expect = data.sortBy(_._1).map { case (k, v) =>
      val out = (k, v, run); run += v; out
    }
    for (parts <- Seq(1, 3, 8, 64)) {
      val got = PrefixSum.exclusive(data.toDF("key", "v"), "v", "run", parts, col("key"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == expect, s"parts=$parts")
    }
  }

  test("input schema and column values pass through unchanged") {
    val df = Seq((3L, "c", 10L), (1L, "a", 5L), (2L, "b", 7L)).toDF("k", "tag", "n")
    val out = PrefixSum.exclusive(df, "n", "off", 2, col("k"))
    assert(out.columns.toSeq == Seq("k", "tag", "n", "off"))
    val rows = out.collect().sortBy(_.getLong(0)).map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, "a", 5L, 0L), (2L, "b", 7L, 5L), (3L, "c", 10L, 12L)))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Long)].toDF("k", "n")
    assert(PrefixSum.exclusive(df, "n", "off", 4, col("k")).count() == 0)
  }

  test("non-BIGINT value column is rejected") {
    val df = Seq((1L, 1)).toDF("k", "n") // n is INT
    intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df, "n", "off", 2, col("k"))
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** The scale path for grouped COUNT(DISTINCT): `approx_count_distinct`
  * (HLL++) — one pass, fixed memory per group, no Expand — versus the
  * exact two-phase form q96 oracle-gates. The spec bounds the relative
  * error at the default rsd (5%) and at a tightened 1% on the real
  * events table, and pins determinism (HLL merge is order-insensitive,
  * so repeated runs agree exactly). */
class ApproxDistinctSpec extends SparkSpec {

  private lazy val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")

  private def exact: Map[String, Long] =
    ev.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("approx_count_distinct within rsd bounds of the exact gate result") {
    for ((rsd, tol) <- Seq(0.05 -> 0.15, 0.01 -> 0.03)) {
      val approx = ev.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), rsd).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ex = exact
      assert(approx.keySet == ex.keySet)
      ex.foreach { case (k, n) =>
        val a = approx(k)
        assert(math.abs(a - n) <= math.max(1L, (n * tol).toLong),
          s"$k: approx $a vs exact $n exceeds ±${tol * 100}% (rsd=$rsd)")
      }
    }
  }

  test("deterministic across runs (order-insensitive HLL merge)") {
    def run() = ev.repartition(7, col("event_id")).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(run() == run())
  }
}

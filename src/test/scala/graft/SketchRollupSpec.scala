package graft

import org.apache.spark.sql.functions._

/** Re-aggregatable distinct-count sketches — the 100 TB cube pattern:
  * pre-aggregate a DataSketches HLL per fine-grained group ONCE, then
  * answer any coarser rollup by MERGING sketches (`hll_union_agg`)
  * instead of rescanning raw data. The spec proves the contract on the
  * real events table: per-type sketches union to the same estimate a
  * direct global sketch gives, estimates stay within HLL error of the
  * exact distinct counts, and merge is order/partitioning-insensitive.
  * No DuckDB twin exists (sketch bytes are engine-specific), so this is
  * spec-gated like the other approximate paths (ApproxDistinctSpec,
  * ApproxQuantileSpec); the exact forms stay oracle-gated (q96). */
class SketchRollupSpec extends SparkSpec {

  private lazy val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")

  test("per-group sketches union to the direct global estimate exactly") {
    val perType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val viaUnion = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .collect()(0).getLong(0)
    val direct = ev
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .collect()(0).getLong(0)
    // identical input multiset -> identical sketch state -> identical
    // estimate: the union path must lose NOTHING vs the direct path
    assert(viaUnion == direct, s"union rollup $viaUnion != direct $direct")
  }

  test("rolled-up estimate is within HLL error of the exact distinct count") {
    val exact = ev.select(countDistinct("user_id")).collect()(0).getLong(0)
    val est = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .collect()(0).getLong(0)
    // default lgConfigK=12 -> rsd ~1.6%; 5% bound = loud regression wire
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"estimate $est vs exact $exact exceeds 5%")
  }

  test("sketch merge is partitioning-insensitive (deterministic rollup)") {
    def run(parts: Int): Long = ev.repartition(parts, col("event_id"))
      .groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .collect()(0).getLong(0)
    assert(run(3) == run(17), "estimate depends on partitioning")
  }
}

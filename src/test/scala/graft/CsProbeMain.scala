package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.CountSketch]] (r15): the sparse
  * CMS shape carried over — one explode to depth (slot, ±w) hits, one
  * map-side-combined (group, slot) sum, exchange ≤ depth·width narrow
  * rows per group. Wall must scale ~linearly in rows and stay flat in
  * group count; the join-size read costs O(depth·width), independent
  * of the rows it summarizes.
  *
  * Usage: Test/runMain graft.CsProbeMain [maxRowsLog10]
  */
object CsProbeMain {
  def main(args: Array[String]): Unit = {
    val maxLog = if (args.length > 0) args(0).toInt else 8
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    for (log <- Seq(6, 7, maxLog).distinct.sorted; groups <- Seq(4, 1024)) {
      val n = math.pow(10, log).toLong
      val df = spark.range(n).select(
        pmod(col("id"), lit(groups.toLong)).cast("string").as("g"),
        pmod(xxhash64(col("id")), lit(n / 4 + 1)).as("v"))
      val t0 = System.nanoTime()
      // full-counter checksum, NOT count() (the Bench.scala lesson)
      val rows = graft.operators.CountSketch.sketch(df, Seq("g"), "v")
        .select(count(lit(1)).as("n"),
          sum(aggregate(col("sketch"), lit(0L), (a, x) => a + x)).as("ck"))
        .head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CS sketch  rows=1e$log groups=$groups%-5d out=$rows%5d " +
        f"wallSec=$sec%8.2f rowsPerSec=${n / sec / 1e6}%7.1fM")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.KmvSketch]] (r15): the 100 TB claim
  * is that [[graft.operators.KmvSketch.sketch]] is ONE map-side-combined
  * aggregation whose exchange carries a fixed-width 256-Long vector per
  * group — so wall time must scale ~linearly in ROWS and be flat in the
  * value cardinality, and the set-operation reads must cost O(groups²·m)
  * independent of the rows they summarize. Probes rows ∈ {1e6, 1e7,
  * 1e8} (100×) at 4 and 1024 groups, then one setops pass over the
  * widest sketch table.
  *
  * Usage: Test/runMain graft.KmvProbeMain [maxRowsLog10]
  */
object KmvProbeMain {
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
        // ~n/2 distinct values: duplicates exercise the min-absorb path
        pmod(xxhash64(col("id")), lit(n / 2 + 1)).as("v"))
      val t0 = System.nanoTime()
      val sk = graft.operators.KmvSketch.sketch(df, Seq("g"), "v")
      // full-register checksum, NOT count(): counting lets Catalyst
      // prune every register expression (the Bench.scala lesson — a
      // count-only plan under-measures by >10×)
      val rows = sk.select(count(lit(1)).as("n"),
          sum(aggregate(col("kmv"), lit(0L), (a, x) => a.bitwiseXOR(x)))
            .as("ck"))
        .head().getLong(0)
      val sketchSec = (System.nanoTime() - t0) / 1e9
      println(f"KMV sketch  rows=1e$log groups=$groups%-5d out=$rows%5d " +
        f"wallSec=$sketchSec%8.2f rowsPerSec=${n / sketchSec / 1e6}%7.1fM")
      if (log == maxLog && groups == 1024) {
        // setops on the stored sketches: O(groups²·m), rows never re-read
        val t1 = System.nanoTime()
        val pairs = graft.operators.KmvSketch
          .setops(df, "g", "v").count()
        val setopsSec = (System.nanoTime() - t1) / 1e9
        // NOTE: setops re-sketches from df here (the TVF shape); the
        // pair-join part alone is the wall minus one sketch pass
        println(f"KMV setops  groups=$groups pairs=$pairs " +
          f"wallSec=$setopsSec%8.2f (incl. one sketch pass)")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

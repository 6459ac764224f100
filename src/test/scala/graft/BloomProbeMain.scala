package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.BloomSketch]] (r15): the 100 TB
  * claim is that [[graft.operators.BloomSketch.sketchSparse]] is one
  * explode-to-k-fixed-width-rows pass and ONE map-side-combined bit_or
  * aggregation whose exchange carries O(hit words) per group — so build
  * wall must scale ~linearly in ROWS (k probes per row) and be flat-ish
  * in the group count — and that the membership read
  * ([[graft.operators.BloomSketch.hitCounts]]) is a broadcast probe of
  * the stored state plus two map-side-combined folds, linear in probe
  * rows and independent of the member rows it summarizes. Probes rows ∈
  * {1e6, 1e7, 1e8} (100×) at 4 and 1024 groups with a 2^16-word filter
  * space, then one hitCounts pass of 1e7 probes against a stored 1e7-
  * member filter.
  *
  * Usage: Test/runMain graft.BloomProbeMain [maxRowsLog10]
  */
object BloomProbeMain {
  def main(args: Array[String]): Unit = {
    val maxLog = if (args.length > 0) args(0).toInt else 8
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val numWords = 1 << 16 // 4.1M bits — the sparse regime, never dense
    for (log <- Seq(6, 7, maxLog).distinct.sorted; groups <- Seq(4, 1024)) {
      val n = math.pow(10, log).toLong
      val df = spark.range(n).select(
        pmod(col("id"), lit(groups.toLong)).cast("string").as("g"),
        // ~n/2 distinct values: duplicates exercise the OR-absorb path
        pmod(xxhash64(col("id")), lit(n / 2 + 1)).as("v"))
      val t0 = System.nanoTime()
      val sk = graft.operators.BloomSketch.sketchSparse(df, Seq("g"), "v",
        numWords, k = 4)
      // full-word checksum, NOT count(): counting lets Catalyst prune
      // the aggregate expressions (the Bench.scala lesson — a count-only
      // plan under-measures by >10×). XOR, not SUM: words run to 2^62
      // and an ANSI Long sum of them overflows
      val words = sk.select(count(lit(1)).as("n"),
          expr("bit_xor(w)").as("ck"))
        .head().getLong(0)
      val sketchSec = (System.nanoTime() - t0) / 1e9
      println(f"BLOOM build rows=1e$log groups=$groups%-5d hitWords=$words%9d " +
        f"wallSec=$sketchSec%8.2f rowsPerSec=${n / sketchSec / 1e6}%7.1fM")
      spark.catalog.clearCache()
    }

    // the read path: 1e7 probes (half members, half strangers) against
    // the STORED state of 1e7 members — member rows never re-read. The
    // filter is SIZED for its set (2^21 words = 132M bits, ~30% fill,
    // fpr ≈ 0.8%): the maybe count then demonstrates the one-sided
    // error honestly instead of a saturated everything-flags filter
    val readWords = 1 << 21
    val members = spark.range(10000000L).select(col("id").as("v"))
    val state = graft.operators.BloomSketch
      .sketchSparse(members, Nil, "v", readWords, k = 4)
      .localCheckpoint()
    val probes = spark.range(10000000L).select(
      col("id").as("doc"), (col("id") * 2).as("v")) // half in, half out
    val t1 = System.nanoTime()
    val flagged = graft.operators.BloomSketch.hitCounts(state, probes,
        Seq("doc"), "v", readWords, k = 4)
      .agg(sum("n_maybe")).head().getLong(0)
    val readSec = (System.nanoTime() - t1) / 1e9
    println(f"BLOOM read  probes=1e7 maybe=$flagged%9d wallSec=$readSec%8.2f " +
      f"probesPerSec=${1e7 / readSec / 1e6}%7.1fM")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r15 deferred-relabel CC maintainer: after a cold start
  * over a large star graph, each small delta batch must cost O(|ΔE|)
  * quotient work + ONE read-only pass over the label view — NOT the
  * O(nodes) label-table rewrite the r14 form paid per batch. Prints the
  * cold-start time, per-delta absorb times (compaction batches stand
  * out and amortize), and one full read.
  *
  * Usage: Test/runMain graft.CcMaintainerProbeMain [nodes] [deltas] [edgesPerDelta]
  */
object CcMaintainerProbeMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val nd = if (args.length > 1) args(1).toInt else 10
    val per = if (args.length > 2) args(2).toLong else 1000L
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val m = new graft.streaming.EventStreaming.CcStateMaintainer()
    // cold start: leaves -> 1024 hubs (q231's star fixture shape)
    val cold = spark.range(n).filter(col("id") % 1024 =!= 0)
      .select(col("id").as("doc_a"), (col("id") - col("id") % 1024).as("doc_b"))
    var t0 = System.nanoTime()
    m.absorb(cold)
    println(f"CCMAINT cold n=$n ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    // small deltas: bridge random hub pairs + fresh nodes
    (1 to nd).foreach { i =>
      val d = spark.range(per).select(
        (pmod(xxhash64(col("id"), lit(i)), lit(n / 1024)) * 1024).as("doc_a"),
        when(col("id") % 3 === 0, col("id") + 3000000000L + i * per)
          .otherwise(pmod(xxhash64(col("id"), lit(i + 7)), lit(n / 1024)) * 1024)
          .as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      t0 = System.nanoTime()
      m.absorb(d)
      println(f"CCMAINT delta$i%-2d absorb ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    t0 = System.nanoTime()
    val cnt = m.current.get.count()
    println(f"CCMAINT read ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$cnt")
    spark.stop()
  }
}

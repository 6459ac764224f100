package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the [[graft.streaming.EventStreaming.SketchStateMaintainer]]
  * bucketed-state crossover (r13 verdict #6): the monolithic maintainer
  * full-outer-joins the WHOLE O(keys) snapshot every micro-batch, so for
  * high key cardinality with SPARSE batches the per-batch exchange is
  * O(keys); the bucketed maintainer joins only the key-hash slices the
  * batch touches. This probe seeds `K` keys, then absorbs `B` sparse
  * batches of `b` keys each, timing the absorb loop for buckets ∈
  * {1, 16, 64} — plus a DENSE-batch pass (every key in every batch)
  * where bucketing must cost, not pay (the distinct-bucket scan + one
  * join per touched slice).
  *
  * Usage: Test/runMain graft.SketchStateProbeMain [K] [batches] [perBatch]
  */
object SketchStateProbeMain {
  def main(args: Array[String]): Unit = {
    val k = if (args.length > 0) args(0).toLong else 200000L
    val nb = if (args.length > 1) args(1).toInt else 10
    val per = if (args.length > 2) args(2).toLong else 200L
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    def seedDf = spark.range(k).select(col("id").as("userId"),
      pmod(xxhash64(col("id")), lit(1000L)).as("valueCents"))
    def sparseBatch(i: Int) = spark.range(per).select(
      (pmod(xxhash64(col("id"), lit(i)), lit(k))).as("userId"),
      pmod(xxhash64(col("id"), lit(i + 7)), lit(1000L)).as("valueCents"))
    def denseBatch(i: Int) = spark.range(k).select(col("id").as("userId"),
      pmod(xxhash64(col("id"), lit(i)), lit(1000L)).as("valueCents"))

    // buckets = 0 is the r15 AUTO segmented default; 1/16/64 pin the base
    // slice count. absorbSec is the write path (per-batch cost the LSM
    // store pays at arrival, incl. compactions); readSec is one full
    // snapshot read afterwards (the deferred monoid fold) — the honest
    // total is both, since the old design paid the fold at every write.
    for (buckets <- Seq(0, 1, 16, 64); dense <- Seq(false, true)) {
      val m = new graft.streaming.EventStreaming.SketchStateMaintainer(
        "userId", "valueCents", 0L, 1000L, 20, buckets)
      m.absorb(seedDf) // the big seed snapshot
      val t0 = System.nanoTime()
      (1 to nb).foreach(i => m.absorb(if (dense) denseBatch(i) else sparseBatch(i)))
      val absorbSec = (System.nanoTime() - t0) / 1e9
      // integrity: total mass == seed + absorbed batches (one full read)
      val t1 = System.nanoTime()
      val total = m.current.get
        .select(sum(aggregate(col("sketch"), lit(0L), (a, x) => a + x)))
        .head().getLong(0)
      val readSec = (System.nanoTime() - t1) / 1e9
      val expect = k + nb * (if (dense) k else per)
      println(f"SKETCHSTATE keys=$k buckets=$buckets%-3d " +
        s"${if (dense) "dense " else "sparse"} batches=$nb " +
        f"absorbSec=$absorbSec%7.2f perBatch=${absorbSec / nb}%6.3f " +
        f"readSec=$readSec%6.2f " +
        s"mass=${if (total == expect) "ok" else s"MISMATCH $total != $expect"}")
      graft.operators.Checkpoints.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures [[graft.operators.Skyline.pareto3d]]'s one structural
  * exposure directly: the cross-partition (y, z) frontier is
  * OUTPUT-SENSITIVE, and the driver merges + broadcasts it (guarded at
  * `maxFrontierPoints`, default 2^20). Two planted regimes at 150k /
  * 1.5M / 15M points (q212's sf0.1 input is ~150k customers — so 1× /
  * 10× / 100×):
  *
  *   benign — x, y, z all hash-correlated with a shared key (the real
  *   trade-off-data shape): the frontier stays tiny, wall tracks the
  *   TeraSort.
  *
  *   anti — within each x value, y = i and z = N - i (every point a
  *   2-D (y, z) maximum): the frontier is O(n). The probe records the
  *   OBSERVED frontier size (via `frontierPointsOut`) with the guard
  *   lifted, plus whether the DEFAULT guard trips — at 1.5M+ points it
  *   must, because a silent O(n) driver merge is exactly what the cap
  *   exists to stop.
  *
  * Usage: Test/runMain graft.SkylineProbeMain [n,n,...]
  */
object SkylineProbeMain {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
                else Seq(150000L, 1500000L, 15000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    for (n <- sizes) {
      // benign: hash-correlated criteria (big x tends to big y, z)
      val benign = spark.range(n).select(
        expr("pmod(xxhash64(id, 1), 1000000)").as("x"),
        expr("pmod(xxhash64(id, 1), 1000000) + pmod(xxhash64(id, 2), 1000)").as("y"),
        expr("pmod(xxhash64(id, 1), 1000000) + pmod(xxhash64(id, 3), 1000)").as("z"))
      // anti: y up, z down — every point a 2-D (y, z) maximum
      val anti = spark.range(n).select(
        expr("pmod(xxhash64(id, 4), 97)").as("x"),
        col("id").as("y"), (lit(n) - col("id")).as("z"))
      for ((label, df) <- Seq("benign" -> benign, "anti" -> anti)) {
        val obs = new java.util.concurrent.atomic.AtomicLong(-1L)
        // lift the cap to OBSERVE the driver-merge path only while it is
        // itself tractable (the anti merge materializes O(parts·n) prefix
        // snapshots — at 15M that IS the blowup the budget routes around)
        val lifted = label == "benign" || n <= 2000000L
        val (sec, cnt) = if (!lifted) (-1.0, -1L) else {
          val t0 = System.nanoTime()
          val c = graft.operators.Skyline
            .pareto3d(df, "x", "y", "z",
              maxFrontierPoints = Long.MaxValue, frontierPointsOut = Some(obs))
            .count()
          ((System.nanoTime() - t0) / 1e9, c)
        }
        // DEFAULT budget: benign stays on the driver path; anti past the
        // cap must switch to the distributed second sweep and COMPLETE —
        // for the anti construction every point survives by construction,
        // so survivors == n is the at-scale oracle
        val usedDist = new java.util.concurrent.atomic.AtomicBoolean(false)
        val t1 = System.nanoTime()
        val dCnt = graft.operators.Skyline.pareto3d(df, "x", "y", "z",
          frontierPointsOut = Some(obs),
          usedDistributedOut = Some(usedDist)).count()
        val dSec = (System.nanoTime() - t1) / 1e9
        val okAnti = label != "anti" || dCnt == n
        println(f"SKYLINE n=$n%-9d $label%-7s liftedSec=$sec%7.2f " +
          f"defaultSec=$dSec%7.2f frontierPts=${obs.get}%-9d " +
          s"survivors=$dCnt path=${if (usedDist.get) "DISTRIBUTED" else "driver"} " +
          s"antiOracle=${if (okAnti) "ok" else "MISMATCH"}")
        graft.operators.Checkpoints.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}

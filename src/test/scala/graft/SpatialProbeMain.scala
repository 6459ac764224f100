package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.Spatial.radiusJoin]] (q192's
  * operator) at CONSTANT POINT DENSITY — the organic way a spatial
  * dataset grows (more area covered, not the same square packed 100×
  * denser, which would quadratically explode the true result set).
  * Points are hash-scattered over a domain whose area scales with n, so
  * per-cell occupancy and per-point neighbor counts stay constant and
  * the true pair count grows linearly.
  *
  * Usage: Test/runMain graft.SpatialProbeMain [factors...]
  *        (default: 1 10 100; base n = 20000 ≈ the sf0.1 gate) */
object SpatialProbeMain {
  def main(args: Array[String]): Unit = {
    val factors = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    for (f <- factors) {
      val n = 20000L * f
      // side ∝ √n keeps density constant; coordinates hash-scattered
      val side = math.max(1L, math.round(9957.0 * math.sqrt(f.toDouble)))
      val pts = spark.range(n).select(col("id"),
        pmod(xxhash64(col("id")), lit(side)).as("x"),
        pmod(xxhash64(col("id"), lit(1L)), lit(side)).as("y"))
      var best = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = graft.operators.Spatial.radiusJoin(pts, "id", "x", "y", 250L)
        rows = df.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"SPATIAL n=$n side=$side pairs=$rows best=$best%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the r15 narrow k-means assign stage: with the argmin folded
  * per row (`array_min` over the centroid-literal scores — no explode,
  * no window, no exchange), per-round cost must scale like ONE map pass
  * whose arithmetic is O(N·k·d) — k=256 costs ~k/8 × the k=8 compute,
  * with NO exchange-volume term (the old explode+window form shuffled
  * N·k rows per round). Prints per-(k, round) wall seconds and the
  * exchange count of the assign plan.
  *
  * Usage: Test/runMain graft.KmeansProbeMain [N] [dim]
  */
object KmeansProbeMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 16
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val vecs = spark.range(n).select(col("id").as("vec_id"),
        expr(s"""transform(sequence(1, $dim),
          d -> CAST(pmod(xxhash64(id, d), 3000) - 1500 AS DOUBLE) / 1000.0)""")
          .as("embedding"))
      .localCheckpoint(true)

    for (k <- Seq(8, 64, 256); rounds <- Seq(1, 3)) {
      val t0 = System.nanoTime()
      val out = graft.embed.Clustering.kmeans(vecs, "vec_id", "embedding",
        k = k, rounds = rounds)
      val cnt = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"KMEANS n=$n k=$k%-4d rounds=$rounds sec=$sec%7.2f " +
        f"perRound=${sec / rounds}%6.2f rows=$cnt")
      graft.operators.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the graph operators (PageRank, Triangles) on
  * synthetic hub-skewed graphs — the decade-scaling evidence PLANS.md
  * records for every operator family.
  *
  * Graph: m hash-derived edges over n = m/10 nodes; 10% of endpoints
  * collapse onto 10 hub nodes (so the biggest hubs carry ~m/100 edges
  * each — the power-law head that breaks id-ordered triangle joins and
  * skew-naive rank contributions). Deterministic (xxhash64 of the edge
  * id), no RNG state.
  *
  * Usage: Test/runMain graft.GraphProbeMain [edgesPerDecade...]
  *        (default: 1000000 10000000)
  */
object GraphProbeMain {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    for (m <- sizes; rep <- 1 to 3) {
      val n = m / 10
      def endpoint(salt: Int) = {
        val h = s"xxhash64(id, $salt)"
        // 10% hub mass on nodes 0..9, the rest uniform
        expr(s"CASE WHEN pmod(xxhash64(id, ${salt + 100}), 10) = 0 " +
          s"THEN pmod($h, 10) ELSE pmod($h, ${n}L) END")
      }
      val edges = spark.range(m)
        .select(endpoint(1).as("s"), endpoint(2).as("d"))
        .filter(col("s") =!= col("d"))
      edges.write.mode("overwrite").parquet("/root/repo/target/graphprobe")
      val e = spark.read.parquet("/root/repo/target/graphprobe")

      val t0 = System.nanoTime()
      val pr = graft.graph.PageRank.pageRank(e, "s", "d", iterations = 3)
      val prSig = pr.select(bit_xor(xxhash64(col("node"), col("rank"))))
        .collect()(0).getLong(0)
      val t1 = System.nanoTime()
      val nTri = graft.graph.Triangles.triangles(e, "s", "d").count()
      val t2 = System.nanoTime()
      val nCore = graft.graph.KCore.kCore(e, "s", "d", k = 8, maxPeels = 5).count()
      val t3 = System.nanoTime()
      val seeds = spark.range(10).select(col("id").as("n")) // the 10 hubs
      val nReach = graft.graph.Bfs.hopDistance(e, "s", "d", seeds, "n", maxHops = 3).count()
      val t4 = System.nanoTime()
      println(f"GRAPH m=$m rep$rep prSec=${(t1 - t0) / 1e9}%.2f " +
        f"triSec=${(t2 - t1) / 1e9}%.2f coreSec=${(t3 - t2) / 1e9}%.2f " +
        f"bfsSec=${(t4 - t3) / 1e9}%.2f nTri=$nTri nCore=$nCore " +
        f"nReach=$nReach prSig=$prSig")
      graft.operators.Checkpoints.releaseAll()
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

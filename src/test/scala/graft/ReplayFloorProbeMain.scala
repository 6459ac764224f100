package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes the streaming-replay gates' 100× cost (r15 verdict #3):
  * the q225/q230 replays are bounded below by (a) the ONE-SHOT sparse
  * sketch of the same slice — the work any engine must do — and (b) the
  * driver-fed MemoryStream harness (collect + re-serialize; the q97
  * replay convention, which a production source never pays). Prints all
  * three so the replay's own overhead is separable from the floor.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> Test/runMain graft.ReplayFloorProbeMain
  */
object ReplayFloorProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val raw = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "click")
    val evts = raw.select(col("event_id").as("eventId"),
        col("user_id").as("userId"),
        graft.events.EventOps.tsMicros(raw).as("tsUs"),
        floor(col("value") * 100).cast("long").as("valueCents"))
      .as[graft.streaming.EventStreaming.Event]

    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"REPLAYFLOOR $what ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (_ <- 1 to 3) {
      time("oneshot_cms_sparse") {
        graft.operators.CountMinSketch.sketchSparse(
          evts.toDF(), Seq("userId"), "valueCents", 4, 128)
          .orderBy("userId", "slot").foreach(_ => ())
      }
      time("driver_collect") { evts.collect().length }
      time("replay_cms_registers") {
        graft.streaming.EventStreaming.cmsReplay(evts, nChunks = 3,
          registers = true).foreach(_ => ())
      }
      graft.operators.Checkpoints.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

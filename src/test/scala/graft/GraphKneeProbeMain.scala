package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Knob characterization for the fourth-decade graph-probe wall-time
  * knee (PLANS round-11 addendum 1): at 100M edges shuffle BYTES stay
  * exactly linear but wall time goes super-linear — attributed to
  * leaving the one-box page-cache regime. This main TESTS that
  * attribution by re-running the same 100M-edge PageRank under each
  * candidate knob in its own SparkContext and recording wall, shuffle
  * bytes, and SPILL bytes (memory + disk — the regime indicator the
  * original probe didn't capture):
  *
  *   base      — lz4, 32 shuffle partitions, on-heap (the probe's config)
  *   parts64 / parts128 — more, smaller shuffle partitions (each fits
  *               memory ⇒ less per-task spill; the knob a 100 TB cluster
  *               turns first)
  *   zstd      — shuffle/spill compression codec (fewer bytes through
  *               the disk, more CPU)
  *   offheap16 — spark.memory.offHeap 16g (Tungsten pages off the JVM
  *               heap ⇒ less GC pressure at the same data volume)
  *
  * The graph, operator and checksum are IDENTICAL across runs (hash-
  * derived edges, one parquet written once) — a knob that changes the
  * signature is a bug, a knob that changes shuffle bytes materially is
  * measuring compression, and the knee verdict reads off wall + spill.
  *
  * Usage: Test/runMain graft.GraphKneeProbeMain [edges] [knob,knob,...]
  *        (defaults: 100000000, all knobs; needs SPARK_DRIVER_MEM=64g
  *        via .jvmopts or forked test JVM opts)
  */
object GraphKneeProbeMain {

  private val KNOBS: Seq[(String, Map[String, String])] = Seq(
    "base" -> Map(),
    "parts64" -> Map("spark.sql.shuffle.partitions" -> "64"),
    "parts128" -> Map("spark.sql.shuffle.partitions" -> "128"),
    "zstd" -> Map("spark.io.compression.codec" -> "zstd"),
    "offheap16" -> Map("spark.memory.offHeap.enabled" -> "true",
      "spark.memory.offHeap.size" -> "17179869184"))

  def main(args: Array[String]): Unit = {
    val m = if (args.nonEmpty) args(0).toLong else 100000000L
    val wanted = if (args.length > 1) args(1).split(",").map(_.trim).toSet
                 else KNOBS.map(_._1).toSet
    // user.dir-relative (the forked test JVM runs with user.dir = repo
    // root), overridable for other layouts
    val path = sys.props.getOrElse("graft.kneeprobe.dir",
      s"${sys.props("user.dir")}/target/kneeprobe")

    def session(extra: Map[String, String]): SparkSession = {
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      extra.foreach { case (k, v) => b.config(k, v) }
      b.getOrCreate()
    }

    // phase 0: one deterministic edge parquet, written once, read by
    // every knob run (same generator as GraphProbeMain: 10% hub mass
    // on 10 nodes, n = m/10)
    locally {
      val spark = session(Map())
      spark.sparkContext.setLogLevel("ERROR")
      val n = m / 10
      def endpoint(salt: Int) = {
        val h = s"xxhash64(id, $salt)"
        expr(s"CASE WHEN pmod(xxhash64(id, ${salt + 100}), 10) = 0 " +
          s"THEN pmod($h, 10) ELSE pmod($h, ${n}L) END")
      }
      spark.range(m)
        .select(endpoint(1).as("s"), endpoint(2).as("d"))
        .filter(col("s") =!= col("d"))
        .write.mode("overwrite").parquet(path)
      spark.stop()
    }

    for ((name, conf) <- KNOBS if wanted(name)) {
      val spark = session(conf)
      spark.sparkContext.setLogLevel("ERROR")
      val shuffleB = new java.util.concurrent.atomic.AtomicLong(0L)
      val spillMemB = new java.util.concurrent.atomic.AtomicLong(0L)
      val spillDiskB = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val tm = sc.stageInfo.taskMetrics
          if (tm != null) {
            shuffleB.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
            spillMemB.addAndGet(tm.memoryBytesSpilled)
            spillDiskB.addAndGet(tm.diskBytesSpilled)
          }
        }
      })
      spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect() // warm codegen
      val e = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val sig = graft.graph.PageRank.pageRank(e, "s", "d", iterations = 3)
        .select(bit_xor(xxhash64(col("node"), col("rank"))))
        .collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      // settle the async listener bus before reading the counters
      var last = -1L; var spins = 0
      while (shuffleB.get != last && spins < 20) {
        last = shuffleB.get; Thread.sleep(300); spins += 1
      }
      def gb(x: Long) = f"${x / 1e9}%.2f"
      println(f"KNEE m=$m knob=$name%-10s prSec=$sec%.1f " +
        s"shufGB=${gb(shuffleB.get)} spillMemGB=${gb(spillMemB.get)} " +
        s"spillDiskGB=${gb(spillDiskB.get)} sig=$sig " +
        s"parts=${spark.conf.get("spark.sql.shuffle.partitions")} " +
        s"codec=${spark.conf.get("spark.io.compression.codec", "lz4")}")
      graft.operators.Checkpoints.releaseAll()
      spark.stop()
    }
  }
}

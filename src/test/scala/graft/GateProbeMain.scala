package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Job-level decomposition probe for optimization work (guide §1): runs the
  * named gates once (bench action: full-row checksum) with a listener that
  * records every job's wall time, stage count, task count, and shuffle
  * read/write bytes — the evidence for "where does this gate's time go"
  * (per-job fixed overhead vs exchange bytes vs compute).
  *
  * Usage: scripts/jrun.sh graft.GateProbeMain q148_hits [more gates...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object GateProbeMain {
  final case class JobRec(id: Int, desc: String, start: Long,
                          var end: Long = 0L,
                          var stages: Int = 0, var tasks: Int = 0,
                          var shufRead: Long = 0L, var shufWrite: Long = 0L)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- args) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val built = System.nanoTime()
      df.select(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
      val done = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      println(f"\n##### $name total ${(done - t0) / 1e9}%.2f s " +
        f"(build ${(built - t0) / 1e9}%.2f s, action ${(done - built) / 1e9}%.2f s)")
      val recs = jobs.synchronized(jobs.values.toSeq)
      val jobWall = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"  jobs=${recs.size} sum(jobWall)=$jobWall%.2f s " +
        f"gap=${(done - t0) / 1e9 - jobWall}%.2f s (driver/planning/idle)")
      recs.foreach { r =>
        val w = math.max(0L, r.end - r.start) / 1e3
        if (w >= 0.02)
          println(f"  job ${r.id}%4d ${w}%6.2f s stages=${r.stages}%2d " +
            f"tasks=${r.tasks}%4d shufR=${r.shufRead / 1048576.0}%8.2f MB " +
            f"shufW=${r.shufWrite / 1048576.0}%8.2f MB  ${r.desc.take(80)}")
      }
      Bench.interQueryCleanup(spark)
    }
    spark.stop()
  }
}

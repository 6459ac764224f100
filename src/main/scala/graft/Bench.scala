package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line and mirrors it to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `BENCH.json` in the cwd) so the driver
  * can parse it even when sbt log noise surrounds stdout.
  *
  * The action is a full-row checksum — `bit_xor(xxhash64(*))` — not
  * `.count()`: counting lets Catalyst prune every computed column (and
  * eliminate sorts under aggregation), which under-measures compute-heavy
  * queries. The checksum forces every output cell to materialize (xor, not
  * sum: ANSI mode makes a Long sum of hashes overflow). Failures propagate:
  * a broken query must fail the bench, not look fast.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet carries TIMESTAMP(NANOS); read as Long ns
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the alphabetically-first
    // query doesn't absorb session startup in its measurement
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    SparkEntry.queries.get("q13_topk").foreach(fn => fn(spark, sfDir).collect())
    def measure(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.select(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
        name -> (System.nanoTime() - t0) / 1e9
      }
    // two measured passes, report the per-query MIN: JIT warm-up, GC luck
    // and co-tenant load perturb any single run (r2 saw the same binary
    // measure 47 s on the builder vs 117 s on the driver)
    val runs = Seq(measure(), measure())
    val results = runs.head.map(_._1).map { name =>
      name -> runs.map(_.toMap.apply(name)).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline value = the BEST SINGLE RUN's total — a total some run
    // actually achieved, comparable across rounds. The per-query numbers
    // are per-query minima across runs (labeled as such); their sum is a
    // composite no single run achieved, so it's reported separately.
    val totals = runs.map(_.map(_._2).sum)
    val total = totals.min
    val minComposite = results.map(_._2).sum
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val env = s"""{"cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""load_avg":${os.getSystemLoadAverage},""" +
      s""""heap_max_gb":${Runtime.getRuntime.maxMemory / (1L << 30)},""" +
      s""""run_totals":[${totals.mkString(",")}]}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""per_query_stat":"min_of_${runs.length}","total_min_composite":$minComposite,""" +
      s""""sf":"$sfDir","runs":${runs.length},"env":$env}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}

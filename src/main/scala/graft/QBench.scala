package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Focused per-query timing harness for optimization work: times the
  * named gate queries (3 runs each, full-checksum action — same action as
  * [[Bench]]) at sf0.1 without paying for the other 50+ queries.
  * Usage: runMain graft.QBench q38_dedup_clusters [more...] */
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B the range-shuffle input-cache knob without a code edit
    sys.env.get("SPARK_GRAFT_RANGE_CACHE")
      .foreach(spark.conf.set(graft.operators.RangeInputCache.ConfKey, _))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    for (name <- args; r <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.select(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
      println(f"TIMING $name run$r ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader/writer for the reference's tab-separated integer KV text format.
  *
  * Reference behavior: `KeyValueTextInputFormat` splits each line at the first
  * tab (`/root/reference/src/SlidingAggregation.java:446-447`) and both fields
  * are parsed as 32-bit ints with no null tolerance (`:49,138-139`). The text
  * sink writes `rank\tkey\tagg` lines, one file per reducer, range-partitioned
  * by rank (`SlidingAggregation.java:528`, `TripleInt.java:91-94`).
  *
  * Spark-native: a CSV scan with an explicit schema (gets column pruning and
  * a vectorized reader for free) instead of a hand-rolled line parser.
  */
object TextKV {
  val schema: StructType = StructType(Seq(
    StructField("key", IntegerType, nullable = false),
    StructField("value", IntegerType, nullable = false)))

  /** Strict parse — the reference crashes on malformed lines; FAILFAST keeps
    * that parity rather than silently nulling. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("mode", "FAILFAST")
      .csv(path)

  /** `rank\tkey\tagg` text sink, range-partitioned into numParts files by
    * rank — the reference's output contract. `numParts <= 0` derives the
    * count from default parallelism, the same contract as
    * `SlidingAggregate.scalable` — the CLI wires ONE flag into both, and a
    * crash here would discard the whole already-executed computation. */
  def writeRanked(df: DataFrame, path: String, numParts: Int): Unit =
    df.repartitionByRange(
        if (numParts >= 1) numParts
        else math.max(2, df.sparkSession.sparkContext.defaultParallelism),
        col("rank"))
      .sortWithinPartitions("rank")
      .select(concat_ws("\t", col("rank"), col("key"), col("agg")).as("value"))
      .write.mode("overwrite").text(path)
}

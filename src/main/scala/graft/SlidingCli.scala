package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{LongMonoid, SlidingAggregate}
import graft.sources.TextKV

/** CLI entry point matching the reference's contract
  * (`/root/reference/README.txt:12-28`, `SlidingAggregation.java:538-554`):
  * read `key\tvalue` int lines, emit `rank\tkey\twindowAgg` text files
  * range-partitioned by rank.
  *
  * Usage: runMain graft.SlidingCli <input> <outputDir> [window=10]
  *        [numParts=4] [agg=sum|count|min|max|avg] [threshold]
  *
  * `threshold` mirrors the reference's `-D my.threshold` Bernoulli sample
  * probability for splitter estimation (`README.txt:12-18`); when omitted,
  * Spark's RangePartitioner reservoir sampling picks the splitters.
  * `avg` is integer (truncating) division of windowed sum by window count.
  */
object SlidingCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SlidingCli <input> <outputDir> [window] [numParts] [agg] [threshold]")
    val input = args(0)
    val output = args(1)
    val window = if (args.length > 2) args(2).toInt else 10
    val numParts = if (args.length > 3) args(3).toInt else 4
    val agg = if (args.length > 4) args(4) else "sum"
    val threshold = if (args.length > 5) Some(args(5).toDouble) else None

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-sliding")
      .config("spark.sql.shuffle.partitions", numParts.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val in = TextKV.read(spark, input)
    val result =
      if (agg == "avg")
        SlidingAggregate.withAvg(
          SlidingAggregate.scalable(in, "key", "value", window, numParts,
            LongMonoid.Sum, threshold), window)
      else
        SlidingAggregate.scalable(in, "key", "value", window, numParts,
          LongMonoid.byName(agg), threshold)
    TextKV.writeRanked(result, output, numParts)
    spark.stop()
  }
}

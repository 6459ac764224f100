package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{LongMonoid, SlidingAggregate}
import graft.sources.TextKV

/** CLI entry point matching the reference's contract
  * (`/root/reference/README.txt:12-28`, `SlidingAggregation.java:538-554`):
  * read `key\tvalue` int lines, emit `rank\tkey\twindowAgg` text files
  * range-partitioned by rank.
  *
  * Two invocation styles, mixable:
  *  - positional: `<input> <outputDir> [window] [numParts] [agg] [threshold]`
  *  - reference `-D` flags (README.txt:28 style), e.g.
  *    `-Dmy.window=37 -Dmy.reducers=2 -Dmy.threshold=0.1 -Dmy.agg=sum <input> <out>`
  *
  * `my.threshold` selects the explicit Bernoulli-sample splitter job; when
  * omitted, Spark's RangePartitioner reservoir sampling picks splitters.
  * `avg` is integer (truncating) division of windowed sum by window count.
  */
object SlidingCli {

  /** Parsed CLI config (exposed for unit testing). */
  final case class Config(input: String, output: String, window: Int,
                          numParts: Int, agg: String, threshold: Option[Double])

  def parse(args: Array[String]): Config = {
    val (flags, positional) = args.partition(_.startsWith("-D"))
    val d = flags.map { f =>
      f.stripPrefix("-D").split("=", 2) match {
        case Array(k, v) => k -> v
        case other => throw new IllegalArgumentException(s"bad flag: $f")
      }
    }.toMap
    require(positional.length >= 2,
      "usage: SlidingCli [-Dmy.window=N] [-Dmy.reducers=N] [-Dmy.agg=A] " +
        "[-Dmy.threshold=T] <input> <outputDir> [window] [numParts] [agg] [threshold]")
    Config(
      input = positional(0),
      output = positional(1),
      window = d.get("my.window").map(_.toInt)
        .getOrElse(if (positional.length > 2) positional(2).toInt else 10),
      numParts = d.get("my.reducers").map(_.toInt)
        .getOrElse(if (positional.length > 3) positional(3).toInt else 4),
      agg = d.getOrElse("my.agg", if (positional.length > 4) positional(4) else "sum"),
      threshold = d.get("my.threshold").map(_.toDouble)
        .orElse(if (positional.length > 5) Some(positional(5).toDouble) else None))
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args)
    // an explicit numParts pins the shuffle-partition conf (the CLI's
    // output-partition contract); otherwise the measured engine defaults
    // apply (Sessions: zstd, 2× cores)
    val spark = Sessions.tuned(SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
        .appName("graft-sliding"),
        cpus = Runtime.getRuntime.availableProcessors)
      .config("spark.sql.shuffle.partitions",
        (if (cfg.numParts >= 1) cfg.numParts else
          Sessions.shuffleParts(Runtime.getRuntime.availableProcessors)).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val in = TextKV.read(spark, cfg.input)
    val result =
      if (cfg.agg == "avg")
        SlidingAggregate.withAvg(
          SlidingAggregate.scalable(in, "key", "value", cfg.window, cfg.numParts,
            LongMonoid.Sum, cfg.threshold), cfg.window)
      else
        SlidingAggregate.scalable(in, "key", "value", cfg.window, cfg.numParts,
          LongMonoid.byName(cfg.agg), cfg.threshold)
    TextKV.writeRanked(result, cfg.output, cfg.numParts)
    spark.stop()
  }
}

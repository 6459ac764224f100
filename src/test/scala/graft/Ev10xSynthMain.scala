package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the 10× events PERFORMANCE-PROBE table (1M rows from sf0.1's
  * 100k) for the PLANS.md second-decade scaling runs on the events /
  * streaming gates — a perf fixture, not an oracle input.
  *
  * Construction: 10 copies with DISJOINT user spaces (`user_id +
  * k·100000`) and distinct event ids (`event_id + k·10000000`),
  * timestamps unchanged. Every events operator partitions by user
  * (window/sessionize/asof/interval join), so per-user structure — and
  * therefore output — replicates exactly 10×: organic user-count growth,
  * the way a real 10× event stream grows. The one global-key gate
  * (q52's hour buckets) sees 10× bucket density instead, which is the
  * harsher direction for it.
  *
  * The other tables the gate set reads (customer for q94) are copied
  * through unchanged — the broadcast dim probe cost is row-count
  * driven on the stream side either way.
  *
  * A second argument generalizes the factor — `100` builds the
  * THIRD-decade probe (10M events) with the same disjoint-user
  * construction (user offsets stay collision-free to factor 100:
  * sf0.1's user ids are < 100000, event ids < 10000000/100).
  *
  * Usage: Test/runMain graft.Ev10xSynthMain [outDir] [factor]
  */
object Ev10xSynthMain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/ev10x")
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    require(factor >= 1 && factor <= 100, s"factor 1..100, got $factor")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val copies = (0 until factor).map { k =>
      ev.select(
        (col("event_id") + lit(k.toLong * 10000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k.toLong * 100000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    copies.reduce(_ union _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    // orders expanded with DISJOINT key spaces — the CDC-merge probes
    // (q119/q129) are keyed joins on o_orderkey, so disjoint-key growth
    // is organic table growth for them (sf0.1 keys are < 10M)
    val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    (0 until factor).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    // lineitem expanded with DISJOINT order-key spaces: orders are the
    // BASKETS of the market-basket probe (q138), so disjoint-key growth
    // is organic basket-count growth — item (partkey) frequencies and
    // pair supports scale ×factor, the linear direction for the pair
    // self-join and the A-Priori prune
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    (0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // part expanded with DISJOINT key spaces: for the hierarchy-rollup
    // probe (q194) this grows the forest ×factor (each copy a factless
    // tree except the original — the closure-construction direction);
    // sf0.1 part keys are < 10M so offsets stay collision-free
    val prt = spark.read.parquet("/root/testdata/sf0.1/part.parquet")
    (0 until factor).map { k =>
      prt.withColumn("p_partkey", col("p_partkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    println(s"EV10X done: ${spark.read.parquet(s"$out/events.parquet").count()} events, " +
      s"${spark.read.parquet(s"$out/orders.parquet").count()} orders, " +
      s"${spark.read.parquet(s"$out/lineitem.parquet").count()} lineitems at $out")
    spark.stop()
  }
}

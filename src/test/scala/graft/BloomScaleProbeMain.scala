package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** 100× probe for the bloom-prefiltered semi join (q107's operator):
  * replicates sf0.1 lineitem/orders 100-fold with disjoint key spaces
  * (~60M fact rows, ~3M hot keys), then times the bloom path against the
  * plain left-semi join — both under the same full-count action. The
  * point at scale: the bloom sketch (a few MiB, O(1) in fact size) prunes
  * non-matching fact rows before the exchange, so the corrective join
  * shuffles ~the matching rows only, while the plain join shuffles the
  * whole fact side.
  *
  * Usage: Test/runMain graft.BloomScaleProbeMain [factor] [priceThreshold]
  * The threshold sets key-side selectivity: 400000 ≈ 20%% of orders (the
  * prefilter cannot win — most fact rows match), 495000 ≈ 0.7%% (the
  * operator's intended regime).
  */
object BloomScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val threshold = args.drop(1).headOption.map(_.toDouble).getOrElse(400000.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shift = 100000000L
    def rep(df: org.apache.spark.sql.DataFrame, keyCol: String) =
      (0 until factor).map(k =>
        df.withColumn(keyCol, col(keyCol) + lit(k * shift)))
        .reduce(_ unionAll _)

    val li = rep(spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_extendedprice"), "l_orderkey")
    val hot = rep(spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .filter(col("o_totalprice") > threshold).select("o_orderkey"), "o_orderkey")

    // cache inputs so both paths read identical in-memory data (the probe
    // times the join strategies, not parquet decode)
    // the 100-way union leaves ~3200 micro-partitions; realistic task
    // sizing (64 × ~1M rows) so per-task fixed costs don't dominate
    val liP = li.repartition(64).persist()
    hot.persist()
    val nKeys = hot.count()
    println(s"fact=${liP.count()} keys=$nKeys")
    // sketch sized to the actual key count: ~8 bits/key → ~2%% FP
    var bits = 1L
    while (bits < nKeys * 8) bits <<= 1

    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val nPlain = liP.join(hot, liP("l_orderkey") === hot("o_orderkey"), "left_semi").count()
      val tPlain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val nBloom = BloomJoin.semiJoin(liP, "l_orderkey", hot, "o_orderkey",
        expectedItems = nKeys, numBits = bits).count()
      val tBloom = (System.nanoTime() - t1) / 1e9
      require(nPlain == nBloom, s"MISMATCH plain=$nPlain bloom=$nBloom")
      println(f"PROBE run$r rows=$nPlain plain=$tPlain%.2f s bloom=$tBloom%.2f s")
    }
    spark.stop()
  }
}

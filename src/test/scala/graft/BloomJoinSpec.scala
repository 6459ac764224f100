package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-prefiltered semi join: exact parity with the plain semi join
  * (false positives corrected), the prefilter actually prunes before the
  * exchange, bounded sketch size, and the SQL surface. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("semiJoin ≡ plain left-semi join on lineitem/orders") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hot = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 300000.0)
    val got = BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = li.join(hot.select(col("o_orderkey")),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("a deliberately tiny sketch (high FP rate) still yields the exact result") {
    // 64 bits for hundreds of keys — the bloom passes almost everything,
    // so this exercises the exact corrective join, not the happy path
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hot = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 300000.0)
    val got = BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey",
        expectedItems = 4, numBits = 64)
      .agg(count(lit(1)), sum("l_orderkey")).head
    val want = li.join(hot.select(col("o_orderkey")),
        li("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)), sum("l_orderkey")).head
    assert(got == want)
  }

  test("the prefilter prunes fact rows before any join: bloom survivors << fact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val keys = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
    val bytes = BloomJoin.sketch(keys, "o_orderkey")
    val factN = li.count()
    val surviveN = li.filter(BloomJoin.mightContain(bytes, col("l_orderkey"))).count()
    val exactN = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi").count()
    // with 2^23 bits for a few hundred keys the FP rate is ~0: the bloom
    // survivor count must sit essentially at the exact match count
    assert(surviveN < factN / 2, s"no pruning: $surviveN of $factN")
    assert(surviveN >= exactN, "bloom can never have false negatives")
    assert(surviveN <= exactN + factN / 100, s"FP explosion: $surviveN vs exact $exactN")
  }

  test("the semi-join plan filters with might_contain BELOW the join") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val hot = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_totalprice") > 400000.0)
    val plan = BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey")
      .queryExecution.sparkPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "no join planned")
    // the fact-side subtree of the (single) semi join must carry the
    // bloom probe — i.e. the filter runs before the exchange, not after
    val factSide = joins.head.left.toString + joins.head.right.toString
    assert(factSide.contains("might_contain"),
      s"bloom probe not below the join:\n$plan")
  }

  test("sketch size is O(numBits), independent of key count") {
    val keys = spark.read.parquet(s"$sfDir/orders.parquet").select("o_orderkey")
    val small = BloomJoin.sketch(keys, "o_orderkey", expectedItems = 1L << 10, numBits = 1L << 13)
    // 2^13 bits = 1 KiB of bitset (+ small header)
    assert(small.length < 2048, s"sketch ${small.length} bytes")
  }

  test("SQL surface: graft_bloom_agg / graft_bloom_contains round-trip") {
    BloomJoin.register(spark)
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("bj_orders")
    val bf = spark.sql(
      """SELECT graft_bloom_agg(o_orderkey, 1024, 8192) AS bf FROM bj_orders
        |WHERE o_totalprice > 400000.0""".stripMargin).head.getAs[Array[Byte]](0)
    spark.read.parquet(s"$sfDir/lineitem.parquet").createOrReplaceTempView("bj_li")
    spark.sql("SELECT * FROM bj_li").createOrReplaceTempView("bj_li2")
    val probed = spark.sql("SELECT count(*) FROM bj_li WHERE graft_bloom_contains(" +
      "unbase64('" + java.util.Base64.getEncoder.encodeToString(bf) + "'), l_orderkey)")
      .head.getLong(0)
    val exact = spark.sql(
      """SELECT count(*) FROM bj_li WHERE l_orderkey IN
        |(SELECT o_orderkey FROM bj_orders WHERE o_totalprice > 400000.0)"""
        .stripMargin).head.getLong(0)
    assert(probed >= exact, "false negative through the SQL surface")
    assert(probed <= exact + 50, s"SQL probe FP explosion: $probed vs $exact")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Salted

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i <= 1800) 1L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = (1L to 2000L).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Salted.join(left, right, "k", saltCol = "lv", factor = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salting actually spreads the hot key across shuffle partitions") {
    // derive the spread from the OPERATOR's own join output, not a local
    // re-implementation of its salt formula: the joined rows' physical
    // partition ids reflect the (key, _salt) shuffle the operator built
    val left = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "lv") // all one key
    val right = Seq((1L, "hot")).toDF("k", "rv")
    val out = Salted.join(left, right, "k", "lv", factor = 8)
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
    val perPart = out.groupBy("pid").count().collect().map(_.getLong(1))
    assert(out.count() == 1000)
    assert(perPart.length >= 4, s"hot key landed in too few partitions: ${perPart.length}")
    assert(perPart.max < 1000 * 0.5, s"salting left a hotspot: ${perPart.mkString(",")}")
  }

  test("hot-keys-only salting: parity with the full-salt form and the plain join") {
    // one genuinely hot key among many cold ones — the regime where
    // replicating the WHOLE right side ×factor is waste
    val left = (1 to 3000).map(i => (if (i <= 2400) 7L else (i % 500).toLong, i.toLong))
      .toDF("k", "lv")
    val right = (0L to 500L).map(i => (i, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val full = Salted.join(left, right, "k", "lv", factor = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val hot = Salted.hotKeys(left, "k", minCount = 1000L)
    assert(hot.collect().map(_.getLong(0)).toSeq == Seq(7L), "hotKeys missed the hot key")
    val hotOnly = Salted.join(left, right, "k", "lv", factor = 8, hotKeys = Some(hot))
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(hotOnly == plain, "hot-only salting changed the join result")
    assert(full == plain)
  }

  test("hot-keys-only salting replicates ONLY the hot slice: two-branch union plan") {
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, s"r$i")).toDF("k", "rv")
    val hot = Salted.hotKeys(left, "k", minCount = 500L)
    val out = Salted.join(left, right, "k", "lv", factor = 8, hotKeys = Some(hot))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Union"), "expected the salted ∪ plain two-branch union")
    // exactly one explode (the salt replication) — the plain branch must
    // not replicate its right side
    val generates = "(?i)generate explode".r.findAllIn(plan).length
    assert(generates == 1, s"expected 1 salt explode in the plan, found $generates")
    assert(out.count() == 1000)
  }

  test("autoJoin: the CMS plan picks the planted regime's strategy and every strategy returns the plain join's rows") {
    // planted SKEW: one key owns 80% of both sides' matches
    val skewL = ((1 to 800).map(i => (7L, i.toLong)) ++
      (1 to 200).map(i => (i.toLong + 100L, i.toLong))).toDF("k", "lv")
    val skewR = ((1 to 50).map(i => (7L, s"h$i")) ++
      (1 to 200).map(i => (i.toLong + 100L, s"r$i"))).toDF("k", "rv")
    val (s1, ra, rb) = Salted.plan(skewL, skewR, "k", broadcastRows = 10L,
      skewMinRows = 100L)
    assert(s1 == "salted", s"expected salted, got $s1")
    assert(ra == 1000L && rb == 250L, "sketch totals must be the exact row counts")
    val plainSkew = skewL.join(skewR, Seq("k")).collect().map(_.toSeq).toSet
    val autoSkew = Salted.autoJoin(skewL, skewR, "k", "lv", factor = 8,
        broadcastRows = 10L, skewMinRows = 100L)
      .collect().map(_.toSeq).toSet
    assert(autoSkew == plainSkew, "salted dispatch changed the result")

    // planted SMALL side → broadcast, and the plan really broadcasts
    val smallR = Seq((7L, "x"), (101L, "y")).toDF("k", "rv")
    assert(Salted.plan(skewL, smallR, "k", broadcastRows = 10L)._1 == "broadcast")
    val bj = Salted.autoJoin(skewL, smallR, "k", "lv", factor = 8,
      broadcastRows = 10L)
    assert(bj.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "broadcast strategy must plan a BroadcastHashJoin")
    assert(bj.collect().map(_.toSeq).toSet ==
      skewL.join(smallR, Seq("k")).collect().map(_.toSeq).toSet)

    // uniform × uniform above broadcast size → shuffle, same rows
    val u1 = (1 to 400).map(i => ((i % 100).toLong, i.toLong)).toDF("k", "lv")
    val u2 = (1 to 400).map(i => ((i % 100).toLong, s"r$i")).toDF("k", "rv")
    assert(Salted.plan(u1, u2, "k", broadcastRows = 10L,
      skewMinRows = 100L)._1 == "shuffle")
    assert(Salted.autoJoin(u1, u2, "k", "lv", factor = 8, broadcastRows = 10L,
        skewMinRows = 100L).collect().map(_.toSeq).toSet ==
      u1.join(u2, Seq("k")).collect().map(_.toSeq).toSet)
  }

  test("hotKeys frame without the key column is rejected") {
    val l = Seq((1L, 2L)).toDF("k", "lv"); val r = Seq((1L, "x")).toDF("k", "rv")
    intercept[IllegalArgumentException] {
      Salted.join(l, r, "k", "lv", factor = 2,
        hotKeys = Some(Seq(1L).toDF("wrong_name")))
    }
    intercept[IllegalArgumentException] { Salted.hotKeys(l, "k", minCount = 0) }
  }

  test("factor = 0 and a pre-existing _salt column are rejected, not silent garbage") {
    val l = Seq((1L, 2L)).toDF("k", "lv"); val r = Seq((1L, "x")).toDF("k", "rv")
    intercept[IllegalArgumentException] { Salted.join(l, r, "k", "lv", factor = 0) }
    intercept[IllegalArgumentException] {
      Salted.join(l.withColumn("_salt", org.apache.spark.sql.functions.lit(1L)),
        r, "k", "lv", factor = 2)
    }
  }
}

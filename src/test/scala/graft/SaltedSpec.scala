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

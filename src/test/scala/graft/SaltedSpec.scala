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

  test("salting actually spreads the hot key across partitions") {
    val left = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "lv") // all one key
    val salted = left.withColumn("_salt", pmod(xxhash64(col("lv")), lit(8L)))
    val buckets = salted.groupBy("_salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8, s"expected 8 salt buckets, got ${buckets.length}")
    assert(buckets.max < 1000 * 0.3, s"salting left a hotspot: ${buckets.mkString(",")}")
  }
}

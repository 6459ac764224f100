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

  test("factor = 0 and a pre-existing _salt column are rejected, not silent garbage") {
    val l = Seq((1L, 2L)).toDF("k", "lv"); val r = Seq((1L, "x")).toDF("k", "rv")
    intercept[IllegalArgumentException] { Salted.join(l, r, "k", "lv", factor = 0) }
    intercept[IllegalArgumentException] {
      Salted.join(l.withColumn("_salt", org.apache.spark.sql.functions.lit(1L)),
        r, "k", "lv", factor = 2)
    }
  }
}

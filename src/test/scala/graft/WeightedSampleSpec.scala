package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** [[Sampling.systematicWeighted]] — deterministic weight-proportional
  * systematic sampling. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("property: selections match the stride definition; copies sum to k") {
    val rnd = new scala.util.Random(47)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(1000).toLong))
    val k = 37
    val got = Sampling.systematicWeighted(rows.toDF("id", "w"), "w", k,
      col("id")).as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val total = rows.map(_._2).sum
    var cum = 0L
    rows.foreach { case (id, w) =>
      val copies = (cum + w) * k / total - cum * k / total
      if (copies >= 1) assert(got(id) == copies, s"id $id")
      else assert(!got.contains(id), s"id $id")
      cum += w
    }
    assert(got.values.sum == k.toLong)
  }

  test("a row heavier than the stride draws multiple copies") {
    // weights 1,1,1,97 with k = 10: stride 10, the heavy row spans ~9.7
    val rows = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 97L))
    val got = Sampling.systematicWeighted(rows.toDF("id", "w"), "w", 10,
      col("id")).as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(4L) >= 9L && got.values.sum == 10L)
  }

  test("zero-weight rows are never selected; all-zero input is empty") {
    val rows = Seq((1L, 0L), (2L, 5L), (3L, 0L))
    val got = Sampling.systematicWeighted(rows.toDF("id", "w"), "w", 3,
      col("id")).as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set(2L) && got.head._3 == 3L)
    val empty = Sampling.systematicWeighted(
      Seq((1L, 0L)).toDF("id", "w"), "w", 3, col("id"))
    assert(empty.count() == 0L)
    assert(empty.columns.contains("copies"))
  }

  test("deterministic under repartition: same selection either way") {
    val rows = (1L to 200L).map(i => (i, (i * 7) % 23 + 1))
    val df = rows.toDF("id", "w")
    val a = Sampling.systematicWeighted(df, "w", 11, col("id"))
      .collect().map(_.toSeq).toSet
    val b = Sampling.systematicWeighted(df.repartition(7), "w", 11, col("id"))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("rejects negative weights, bad k, and overflow-risk totals") {
    val df = Seq((1L, -1L), (2L, 5L)).toDF("id", "w")
    intercept[IllegalArgumentException](
      Sampling.systematicWeighted(df, "w", 3, col("id")))
    val ok = Seq((1L, 5L)).toDF("id", "w")
    intercept[IllegalArgumentException](
      Sampling.systematicWeighted(ok, "w", 0, col("id")))
    val huge = Seq((1L, Long.MaxValue / 2), (2L, Long.MaxValue / 2))
      .toDF("id", "w")
    intercept[IllegalArgumentException](
      Sampling.systematicWeighted(huge, "w", 10, col("id")))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TableOps

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  /** The library's rank convention: value at 0-indexed rank ⌊num·n/den⌋
    * of the sorted non-null values. */
  private def at(sorted: Seq[Long], num: Int, den: Int): Long =
    sorted(((num.toLong * sorted.size) / den).toInt)

  test("property: clamp matches the sorted-rank definition on random groups") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(500)((s"g${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "x")
    val got = TableOps.winsorize(df, "g", "x", loNum = 1, hiNum = 9, den = 10)
      .select("g", "x", "x_w").as[(String, Long, Long)].collect()
    val bySorted = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).sorted
    }
    assert(got.length == rows.length)
    got.foreach { case (g, x, xw) =>
      val s = bySorted(g)
      val (lo, hi) = (at(s, 1, 10), at(s, 9, 10))
      assert(xw == math.max(lo, math.min(hi, x)), s"group $g value $x")
    }
  }

  test("ties compress but do not shift the threshold value") {
    // 10 values, 8 of them identical: any quantile inside the tie block
    // must return the tied value itself
    val df = (Seq.fill(8)(5L) ++ Seq(1L, 9L)).map(("g", _)).toDF("g", "x")
    val got = TableOps.winsorize(df, "g", "x", 1, 9, 10)
      .select("x", "x_w").as[(Long, Long)].collect().toMap
    // rank ⌊1·10/10⌋=1 → sorted(1)=5; rank ⌊9·10/10⌋=9 → sorted(9)=9
    assert(got(1L) == 5L && got(5L) == 5L && got(9L) == 9L)
  }

  test("NULL values pass through as NULL and don't move thresholds") {
    val df = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)),
      ("g", Some(4L)), ("g", None)).toDF("g", "x")
    val got = TableOps.winsorize(df, "g", "x", 1, 3, 4).select("x", "x_w")
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // non-null sorted = [1,2,3,4]; lo = rank 1 → 2, hi = rank 3 → 4
    assert(got(Some(1L)) == Some(2L) && got(Some(4L)) == Some(4L))
    assert(got(None) == None)
  }

  test("rejects inverted or out-of-range fractions and colliding names") {
    val df = Seq(("g", 1L)).toDF("g", "x")
    intercept[IllegalArgumentException](TableOps.winsorize(df, "g", "x", 3, 2, 4))
    intercept[IllegalArgumentException](TableOps.winsorize(df, "g", "x", 0, 4, 4))
    intercept[IllegalArgumentException](
      TableOps.winsorize(df.withColumn("x_w", lit(0L)), "g", "x", 1, 2, 4))
  }
}

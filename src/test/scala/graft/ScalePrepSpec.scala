package graft

import org.apache.spark.sql.functions._

import graft.operators.TableOps

/** [[TableOps.minmaxScale]] and [[TableOps.equiDepthBuckets]] — the two
  * rank/range feature-scaling preprocessing operators added beside
  * percentRanks/winsorize. */
class ScalePrepSpec extends SparkSpec {
  import spark.implicits._

  // ── minmaxScale ────────────────────────────────────────────────────────

  test("property: scaled value matches the closed form on random groups") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(400)((s"g${rnd.nextInt(5)}", rnd.nextInt(10000).toLong))
    val got = TableOps.minmaxScale(rows.toDF("g", "x"), "g", "x")
      .select("g", "x", "x_mm").as[(String, Long, Long)].collect()
    val stats = rows.groupBy(_._1).map { case (g, rs) =>
      g -> (rs.map(_._2).min, rs.map(_._2).max)
    }
    assert(got.length == rows.length)
    got.foreach { case (g, x, mm) =>
      val (mn, mx) = stats(g)
      val want = if (mx == mn) 0L else (x - mn) * 1000000L / (mx - mn)
      assert(mm == want, s"group $g value $x")
      assert(mm >= 0L && mm <= 1000000L)
    }
  }

  test("constant group scales to 0; NULL x stays NULL") {
    val df = Seq(("c", Some(7L)), ("c", Some(7L)), ("v", Some(1L)),
      ("v", Some(3L)), ("v", None)).toDF("g", "x")
    val got = TableOps.minmaxScale(df, "g", "x")
      .select("g", "x", "x_mm").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got(("c", Some(7L), Some(0L))))
    assert(got(("v", Some(1L), Some(0L))))
    assert(got(("v", Some(3L), Some(1000000L))))
    assert(got(("v", None, None)))
  }

  test("a group whose values are all NULL keeps NULL in the scaled column") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("z", None))
      .toDF("g", "x")
    val z = TableOps.minmaxScale(df, "g", "x")
      .filter(col("g") === "z").select("x_mm").collect()
    assert(z.length == 1 && z.head.isNullAt(0))
  }

  test("group span past Long.Max/scale raises instead of wrapping") {
    val df = Seq(("g", 0L), ("g", Long.MaxValue / 1000L)).toDF("g", "x")
    val e = intercept[Exception](
      TableOps.minmaxScale(df, "g", "x", scale = 1000000L)
        .select("x_mm").collect())
    assert(e.getMessage.contains("overflow") ||
      e.getCause != null && e.getCause.getMessage.contains("overflow"))
  }

  test("minmaxScale rejects bad arguments and colliding names") {
    val df = Seq(("g", 1L)).toDF("g", "x")
    intercept[IllegalArgumentException](TableOps.minmaxScale(df, "x", "x"))
    intercept[IllegalArgumentException](TableOps.minmaxScale(df, "g", "x", 0L))
    intercept[IllegalArgumentException](
      TableOps.minmaxScale(df.withColumn("x_mm", lit(0L)), "g", "x"))
  }

  // ── equiDepthBuckets ──────────────────────────────────────────────────

  test("property: buckets match the rows-below definition; invariants hold") {
    val rnd = new scala.util.Random(11)
    // skewed: value 42 is heavy, the rest uniform
    val vals = Seq.fill(300)(rnd.nextInt(100).toLong) ++ Seq.fill(100)(42L)
    val got = TableOps.equiDepthBuckets(vals.toDF("x"), "x", nBuckets = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    val n = vals.size.toLong
    val sorted = vals.sorted
    def bucketOf(v: Long): Long = sorted.count(_ < v) * 8L / n
    // every distinct value lands in its defined bucket's [lo, hi]
    vals.distinct.foreach { v =>
      val b = bucketOf(v)
      val row = got.find(_._1 == b).get
      assert(row._2 <= v && v <= row._3, s"value $v bucket $b")
    }
    // totals reconcile; buckets ascend with disjoint value ranges
    assert(got.map(_._4).sum == n)
    assert(got.map(_._5).sum == vals.distinct.size)
    val byBucket = got.sortBy(_._1)
    byBucket.sliding(2).foreach {
      case Array(a, b) => assert(a._1 < b._1 && a._3 < b._2)
      case _ =>
    }
  }

  test("ties never straddle buckets; heavy value overfills its bucket") {
    val vals = Seq.fill(90)(5L) ++ Seq(1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L, 10L, 11L)
    val got = TableOps.equiDepthBuckets(vals.toDF("x"), "x", 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    // 5 has 4 rows below → bucket 4*4/100 = 0; all 90 copies land there
    val b0 = got.find(_._1 == 0L).get
    assert(b0._2 == 1L && b0._3 == 5L && b0._4 == 94L)
  }

  test("NULLs are excluded; empty input yields an empty frame with schema") {
    val some = Seq(Some(1L), Some(2L), None).toDF("x")
    assert(TableOps.equiDepthBuckets(some, "x", 2)
      .agg(sum("n_rows")).head.getLong(0) == 2L)
    val empty = TableOps.equiDepthBuckets(
      Seq.empty[Option[Long]].toDF("x"), "x", 4)
    assert(empty.columns.toSeq ==
      Seq("bucket", "lo", "hi", "n_rows", "n_distinct"))
    assert(empty.count() == 0L)
  }

  test("nBuckets = 1 degenerates to one bucket holding everything") {
    val got = TableOps.equiDepthBuckets(
      Seq(3L, 1L, 2L).toDF("x"), "x", 1)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 1L, 3L, 3L, 3L)))
  }
}

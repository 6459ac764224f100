package graft

import org.apache.spark.sql.functions._

import graft.operators.TableOps

/** [[TableOps.corrPairs]] (exact pairwise correlation statistics) and
  * [[TableOps.melt]] (wide→long unpivot). */
class CorrMeltSpec extends SparkSpec {
  import spark.implicits._

  // ── corrPairs ─────────────────────────────────────────────────────────

  test("property: moment forms match the brute-force definition") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(300)((rnd.nextInt(100).toLong,
      rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    val got = TableOps.corrPairs(rows.toDF("a", "b", "c"),
      Seq("a", "b", "c")).collect()
    assert(got.length == 3) // C(3,2)
    def brute(xs: Seq[Long], ys: Seq[Long]) = {
      val n = xs.size.toLong
      (n, xs.sum, ys.sum, xs.map(v => v * v).sum, ys.map(v => v * v).sum,
        xs.zip(ys).map { case (x, y) => x * y }.sum)
    }
    val cols = Map("a" -> rows.map(_._1), "b" -> rows.map(_._2),
      "c" -> rows.map(_._3))
    got.foreach { r =>
      val (x, y) = (r.getString(0), r.getString(1))
      val (n, sx, sy, sxx, syy, sxy) = brute(cols(x), cols(y))
      assert(r.getLong(2) == n && r.getLong(3) == sx && r.getLong(4) == sy)
      assert(r.getLong(5) == sxx && r.getLong(6) == syy && r.getLong(7) == sxy)
      def dec(i: Int) = BigInt(r.getDecimal(i).toBigInteger)
      assert(dec(8) == BigInt(n) * sxy - BigInt(sx) * sy)  // cov_num
      assert(dec(9) == BigInt(n) * sxx - BigInt(sx) * sx)  // var_x
      assert(dec(10) == BigInt(n) * syy - BigInt(sy) * sy) // var_y
    }
  }

  test("perfect linear relation: cov_num² equals var_x·var_y (r² = 1)") {
    val rows = (1L to 50L).map(i => (i, 3 * i + 7))
    val r = TableOps.corrPairs(rows.toDF("x", "y"), Seq("x", "y")).head
    def dec(i: Int) = BigInt(r.getDecimal(i).toBigInteger)
    val (cov, vx, vy) = (dec(8), dec(9), dec(10))
    assert(cov * cov == vx * vy && cov > 0)
  }

  test("moment forms survive magnitudes whose n·Σ products overflow Int64") {
    // wide-spread 2e5-cent values over 2e5 rows: var_x ≈ n²·spread²/12
    // ≈ 1.3e20 > Int64, while Σxx ≈ 2.7e15 stays comfortably inside
    val rnd = new scala.util.Random(17)
    val rows = (1 to 200000).map(_ =>
      (rnd.nextInt(200000).toLong, rnd.nextInt(200000).toLong))
    val r = TableOps.corrPairs(rows.toDF("x", "y"), Seq("x", "y")).head
    val (n, sxx) = (BigInt(r.getLong(2)), BigInt(r.getLong(5)))
    val sx = BigInt(r.getLong(3))
    val want = n * sxx - sx * sx
    assert(want > BigInt(Long.MaxValue)) // the case BIGINT cannot hold
    assert(BigInt(r.getDecimal(9).toBigInteger) == want)
  }

  test("pairwise-complete: a NULL excludes the row from that pair only") {
    val df = Seq((Some(1L), Some(10L), Some(5L)),
      (Some(2L), None, Some(6L)),
      (Some(3L), Some(30L), None)).toDF("a", "b", "c")
    val got = TableOps.corrPairs(df, Seq("a", "b", "c"))
      .select("x_col", "y_col", "n").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 2L && got(("a", "c")) == 2L
      && got(("b", "c")) == 1L)
  }

  test("empty pair yields n = 0 with zero sums, not NULLs") {
    val df = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
    val r = TableOps.corrPairs(df, Seq("a", "b")).head
    (2 to 7).foreach(i => assert(!r.isNullAt(i) && r.getLong(i) == 0L))
  }

  test("corrPairs rejects bad column sets") {
    val df = Seq((1L, "s")).toDF("a", "s")
    intercept[IllegalArgumentException](TableOps.corrPairs(df, Seq("a")))
    intercept[IllegalArgumentException](
      TableOps.corrPairs(df, Seq("a", "a")))
    intercept[IllegalArgumentException](
      TableOps.corrPairs(df, Seq("a", "s"))) // s is not BIGINT
    intercept[IllegalArgumentException](
      TableOps.corrPairs(df, Seq("a", "nope")))
  }

  // ── melt ──────────────────────────────────────────────────────────────

  test("melt fans each row out to one row per value column, NULLs kept") {
    val df = Seq((1L, Some(10L), Option.empty[Long]),
      (2L, Some(20L), Some(21L))).toDF("id", "m1", "m2")
    val got = TableOps.melt(df, Seq("id"), Seq("m1", "m2"))
      .orderBy("id", "var").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq((1L, "m1", Some(10L)), (1L, "m2", None),
      (2L, "m1", Some(20L)), (2L, "m2", Some(21L))))
  }

  test("melt plans narrow: no shuffle exchange in the physical plan") {
    val df = Seq((1L, 2L, 3L)).toDF("id", "m1", "m2")
    val plan = TableOps.melt(df, Seq("id"), Seq("m1", "m2"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("melt rejects overlapping or missing columns") {
    val df = Seq((1L, 2L)).toDF("id", "m")
    intercept[IllegalArgumentException](
      TableOps.melt(df, Seq("id"), Seq("id")))
    intercept[IllegalArgumentException](
      TableOps.melt(df, Seq("id"), Seq("nope")))
    intercept[IllegalArgumentException](
      TableOps.melt(df, Seq.empty, Seq("m")))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Experiment, TableOps}

/** [[Experiment.abReport]] and [[TableOps.quantileSummary]]. */
class AbQuantileSpec extends SparkSpec {
  import spark.implicits._

  // ── abReport ──────────────────────────────────────────────────────────

  test("counts and effect fractions match brute force") {
    val units = Seq(
      ("ctl", 0L), ("ctl", 1L), ("ctl", 0L), ("ctl", 1L), ("ctl", 0L),
      ("t1", 1L), ("t1", 1L), ("t1", 0L),
      ("t2", 0L), ("t2", 0L)).toDF("variant", "cv")
    val got = Experiment.abReport(units, "variant", "cv", "ctl")
      .collect().map(r => r.getString(0) -> r.toSeq.tail.map(_.asInstanceOf[Long]))
      .toMap
    // ctl: n=5 conv=2; t1: n=3 conv=2; t2: n=2 conv=0
    assert(got("t1") == Seq(3L, 2L, 5L, 2L,
      2L * 5L, 2L * 3L,          // rr = (conv_t·n_c)/(conv_c·n_t)
      2L * (5L - 2L), 2L * (3L - 2L))) // or
    assert(got("t2") == Seq(2L, 0L, 5L, 2L, 0L, 4L, 0L, 4L))
    assert(!got.contains("ctl"))
  }

  test("zero-conversion control keeps denominators at 0 (no division)") {
    val units = Seq(("ctl", 0L), ("t", 1L)).toDF("variant", "cv")
    val r = Experiment.abReport(units, "variant", "cv", "ctl").head
    assert(r.getLong(6) == 0L && r.getLong(8) == 0L) // rr_den, or_den
  }

  test("non-0/1 conversion flags raise loudly") {
    val units = Seq(("ctl", 0L), ("t", 2L)).toDF("variant", "cv")
    val e = intercept[Exception](
      Experiment.abReport(units, "variant", "cv", "ctl").collect())
    assert(e.getMessage.contains("0/1") ||
      (e.getCause != null && e.getCause.getMessage.contains("0/1")))
  }

  // ── quantileSummary ───────────────────────────────────────────────────

  test("property: every quantile value matches the sorted-rank definition") {
    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(600)((s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
    val qs = Seq((1, 10), (1, 4), (1, 2), (3, 4), (9, 10))
    val got = TableOps.quantileSummary(rows.toDF("g", "x"), "g", "x", qs)
      .as[(String, Long, Long, Long, Long)].collect()
    val byG = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    assert(got.length == byG.size * qs.size)
    got.foreach { case (g, num, den, v, n) =>
      val s = byG(g)
      assert(n == s.size.toLong)
      assert(v == s(((num * n) / den).toInt), s"group $g q $num/$den")
    }
  }

  test("ties: any quantile inside a tie block returns the tied value") {
    val df = (Seq.fill(8)(5L) ++ Seq(1L, 9L)).map(("g", _)).toDF("g", "x")
    val got = TableOps.quantileSummary(df, "g", "x", Seq((1, 10), (9, 10)))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(got((1L, 10L)) == 5L && got((9L, 10L)) == 9L)
  }

  test("all quantiles come from ONE aggregation over the ranked table") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("g", "x")
    val plan = TableOps.quantileSummary(df, "g", "x")
      .queryExecution.optimizedPlan.toString
    // one window pass + one aggregate; adding quantiles must not add
    // passes — count Window occurrences (2 window FUNCTIONS, 1 node)
    val windowNodes = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windowNodes <= 2, plan)
  }

  test("NULL-only groups are dropped; NULL values excluded from ranks") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("z", None)).toDF("g", "x")
    val got = TableOps.quantileSummary(df, "g", "x", Seq((1, 2)))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == Set("a"))
    assert(got.head._5 == 2L && got.head._4 == 2L) // n=2, median rank 1 → 2
  }

  test("rejects invalid fractions and duplicates") {
    val df = Seq(("g", 1L)).toDF("g", "x")
    intercept[IllegalArgumentException](
      TableOps.quantileSummary(df, "g", "x", Seq((4, 4))))
    intercept[IllegalArgumentException](
      TableOps.quantileSummary(df, "g", "x", Seq((1, 2), (1, 2))))
    intercept[IllegalArgumentException](
      TableOps.quantileSummary(df, "g", "x", Seq.empty))
  }
}

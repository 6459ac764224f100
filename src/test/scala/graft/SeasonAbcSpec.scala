package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.operators.TableOps

/** [[EventOps.seasonalProfile]] and [[TableOps.abcAnalysis]]. */
class SeasonAbcSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── seasonalProfile ───────────────────────────────────────────────────

  test("a planted weekly shape yields zero residuals; a break stands out") {
    // 4 full weeks where value = 10·(1 + dow), plus one broken Sunday
    val rows = (0L until 28L).map(d => ("a", d, 10.0 * (1 + d % 7))) :+
      ("a", 28L, 99.0) // day 28 is phase 0; baseline phase-0 mean shifts
    val got = EventOps.seasonalProfile(ev(rows))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    // phases 1..6 (unbroken): residual exactly 0 everywhere
    got.values.filter(r => r._3 != 0L).foreach(r =>
      assert(r._7 == 0L, s"bucket ${r._2}"))
    // phase 0: n_p=5, sum = 4·1000 + 9900; day 28's residual is positive
    // and the four regular Sundays' negative, summing to zero
    val p0 = got.values.filter(_._3 == 0L).toSeq
    assert(p0.map(_._7).sum == 0L)
    assert(got(28L)._7 > 0L && got(0L)._7 < 0L)
  }

  test("property: baseline and residuals match brute force") {
    val rnd = new scala.util.Random(79)
    val rows = for (ty <- Seq("a", "b"); d <- 0L until 20L)
      yield (ty, d, rnd.nextInt(500) / 100.0)
    val got = EventOps.seasonalProfile(ev(rows), periodBuckets = 5)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val daily = rows.map { case (ty, d, v) =>
      (ty, d) -> math.floor(v * 100).toLong }.toMap
    val byPhase = daily.groupBy { case ((ty, d), _) => (ty, d % 5) }
    got.foreach { case (ty, b, ph, x, np, sp, resid) =>
      assert(ph == b % 5 && x == daily((ty, b)))
      val phase = byPhase((ty, ph)).values
      assert(np == phase.size.toLong && sp == phase.sum)
      assert(resid == np * x - sp)
    }
  }

  // ── abcAnalysis ───────────────────────────────────────────────────────

  test("classic Pareto: heavy groups are A, the long tail is C") {
    // sums: 800, 150, 30, 10, 10 (total 1000)
    val rows = Seq.fill(8)(("g1", 100L)) ++ Seq.fill(3)(("g2", 50L)) ++
      Seq(("g3", 30L), ("g4", 10L), ("g5", 10L))
    val got = TableOps.abcAnalysis(rows.toDF("g", "x"), "g", "x")
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.map(r => r._1 -> r._5).toMap ==
      Map("g1" -> "A", "g2" -> "B", "g3" -> "C", "g4" -> "C", "g5" -> "C"))
    // ranks are 1-based in sum-desc order with deterministic ties
    assert(got.map(_._3).toSeq == (1L to 5L))
    assert(got.map(_._4).toSeq == Seq(0L, 800L, 950L, 980L, 990L))
  }

  test("a single dominant group is still class A (exclusive-prefix rule)") {
    val got = TableOps.abcAnalysis(
      Seq(("big", 990L), ("tail", 10L)).toDF("g", "x"), "g", "x")
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.find(_._1 == "big").get._5 == "A")
    assert(got.find(_._1 == "tail").get._5 == "C")
  }

  test("ties rank deterministically by group name") {
    val got = TableOps.abcAnalysis(
      Seq(("z", 10L), ("a", 10L), ("m", 10L)).toDF("g", "x"), "g", "x")
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.map(_._1).toSeq == Seq("a", "m", "z"))
  }

  test("negative sums and invalid boundaries raise") {
    val df = Seq(("g", -5L), ("h", 10L)).toDF("g", "x")
    intercept[IllegalArgumentException](TableOps.abcAnalysis(df, "g", "x"))
    val ok = Seq(("g", 5L)).toDF("g", "x")
    intercept[IllegalArgumentException](
      TableOps.abcAnalysis(ok, "g", "x", aPct = 95, bPct = 80))
  }
}

package graft

import java.sql.Timestamp

import graft.events.EventOps

/** [[EventOps.rollingMedian]] and [[EventOps.holtSmooth]]. */
class RollingHoltSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── rollingMedian ─────────────────────────────────────────────────────

  test("property: every observed bucket gets the lower median of its window") {
    val rnd = new scala.util.Random(197)
    val days = (0L until 40L).filter(_ => rnd.nextBoolean()) // gapped
    val rows = days.map(d => ("a", d, rnd.nextInt(1000).toDouble))
    val series = rows.map(r => r._2 -> (r._3 * 100).toLong).toMap
    val got = EventOps.rollingMedian(ev(rows)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == series.keySet, "one output row per observed bucket")
    for (d <- days) {
      val win = (d - 6 to d).filter(series.contains).map(series).sorted
      assert(got(d) == ((win.size.toLong, win((win.size - 1) / 2))), s"day $d")
    }
  }

  test("even window size takes the LOWER middle") {
    // days 0..3 with values 40,10,30,20: window at day 3 = [10,20,30,40]
    val rows = Seq(("a", 0L, 0.40), ("a", 1L, 0.10), ("a", 2L, 0.30),
      ("a", 3L, 0.20))
    val got = EventOps.rollingMedian(ev(rows)).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got(3L) == 20L, "lower middle of {10,20,30,40} is 20")
    assert(got(1L) == 10L, "lower middle of {10,40} is 10")
  }

  // ── holtSmooth ────────────────────────────────────────────────────────

  private def holtRef(xs: Seq[Long], aN: Long, aD: Long, bN: Long,
                      bD: Long): (Long, Long) = {
    def fdiv(e: Long, d: Long) = { val m = ((e % d) + d) % d; (e - m) / d }
    xs.tail.foldLeft((xs.head, 0L)) { case ((l, b), x) =>
      val nl = fdiv(aN * x + (aD - aN) * (l + b), aD)
      (nl, fdiv(bN * (nl - l) + (bD - bN) * b, bD))
    }
  }

  test("property: fold matches the scalar reference, including declines") {
    val rnd = new scala.util.Random(198)
    val rows = (0L until 50L).map(d =>
      ("a", d, (5000 - d * 90 + rnd.nextInt(100)).toDouble / 100.0)) ++
      (0L until 30L).map(d => ("b", d, (d * d).toDouble))
    val got = EventOps.holtSmooth(ev(rows), 3L, 10L, 1L, 10L).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (ty <- Seq("a", "b")) {
      val xs = rows.filter(_._1 == ty).sortBy(_._2)
        .map(r => math.floor(r._3 * 100).toLong)
      val (l, b) = holtRef(xs, 3L, 10L, 1L, 10L)
      assert(got(ty) == ((xs.size.toLong, l, b, l + b)), ty)
    }
    // the declining series must carry a NEGATIVE trend — the floor-div path
    assert(got("a")._3 < 0L, "declining series should have negative trend")
  }

  test("a ramp's forecast beats EWMA's lag: forecast tracks the next value") {
    // strict ramp 100, 200, ..., 3000 cents: trend converges toward 100
    val rows = (0L until 30L).map(d => ("a", d, (d + 1).toDouble))
    val got = EventOps.holtSmooth(ev(rows), 3L, 10L, 1L, 10L).collect().head
    val (level, trend, forecast) = (got.getLong(2), got.getLong(3), got.getLong(4))
    assert(trend > 0L)
    assert(forecast == level + trend)
    assert(forecast > level, "forecast must extrapolate the ramp upward")
  }

  test("single-bucket series returns (x, 0, x)") {
    val got = EventOps.holtSmooth(ev(Seq(("a", 0L, 1.23))),
      3L, 10L, 1L, 10L).collect().head
    assert((got.getLong(2), got.getLong(3), got.getLong(4)) == ((123L, 0L, 123L)))
  }

  test("lastN caps the series: only the trailing buckets feed the fold") {
    val rows = (0L until 20L).map(d => ("a", d, (d + 1).toDouble))
    val capped = EventOps.holtSmooth(ev(rows), 3L, 10L, 1L, 10L, lastN = 5)
      .collect().head
    val xs = rows.sortBy(_._2).takeRight(5).map(r => (r._3 * 100).toLong)
    val (l, b) = holtRef(xs, 3L, 10L, 1L, 10L)
    assert((capped.getLong(1), capped.getLong(2), capped.getLong(3))
      == ((5L, l, b)))
  }

  test("rejects bad rationals and caps") {
    val df = ev(Seq(("a", 0L, 1.0)))
    intercept[IllegalArgumentException](EventOps.holtSmooth(df, 0L, 10L, 1L, 10L))
    intercept[IllegalArgumentException](EventOps.holtSmooth(df, 3L, 10L, 11L, 10L))
    intercept[IllegalArgumentException](EventOps.rollingMedian(df, window = 0))
  }
}

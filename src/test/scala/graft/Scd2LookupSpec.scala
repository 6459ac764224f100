package graft

import java.sql.Timestamp

import graft.events.EventOps

/** [[EventOps.scd2Lookup]], [[EventOps.denseSeries]],
  * [[EventOps.velocity]]. */
class Scd2LookupSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Double)]) =
    rows.zipWithIndex.map { case ((u, tms, ty, v), i) =>
      (i.toLong, new Timestamp(tms), u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── scd2Lookup ────────────────────────────────────────────────────────

  test("lookup returns the version containing each probe; pre-history is NULL") {
    // user 1 versions: a@[10, 30), b@[30, ∞)
    val dim = Seq((1L, "a", 10L, Some(30L)), (1L, "b", 30L, None))
      .map { case (u, st, f, t) => (u, st, f, t) }
      .toDF("user_id", "state", "valid_from_us", "valid_to_us")
    val probes = Seq((1L, 5L), (1L, 10L), (1L, 29L), (1L, 30L), (1L, 99L))
      .toDF("user_id", "tus")
    val got = EventOps.scd2Lookup(dim, probes, "user_id", "tus")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getString(2)))).toMap
    assert(got == Map(5L -> None, 10L -> Some("a"), 29L -> Some("a"),
      30L -> Some("b"), 99L -> Some("b")))
  }

  test("lookup agrees with interval containment on a generated history") {
    val rnd = new scala.util.Random(206)
    val rows = (0 until 200).map { i =>
      (rnd.nextInt(5).toLong + 1, i.toLong * 1000,
        s"s${rnd.nextInt(3)}", 1.0)
    }
    val dim = EventOps.scd2(ev(rows)).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3)))
    val probes = rows.map(r => (r._1, r._2 * 1000L + 777L)).distinct
    val got = EventOps.scd2Lookup(EventOps.scd2(ev(rows)),
        probes.toDF("user_id", "tus"), "user_id", "tus")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getString(2)))).toMap
    for ((u, t) <- probes) {
      val want = dim.find(d => d._1 == u && d._3 <= t && t < d._4).map(_._2)
      assert(got((u, t)) == want, s"user $u t $t")
    }
  }

  // ── denseSeries ───────────────────────────────────────────────────────

  test("gaps fill with zero; spine spans exactly [first, last] per type") {
    val day = 86400000L
    val rows = Seq((1L, 0 * day, "a", 1.0), (1L, 3 * day, "a", 2.0),
      (1L, 1 * day, "b", 5.0))
    val got = EventOps.denseSeries(ev(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", 0L) -> 100L, ("a", 1L) -> 0L, ("a", 2L) -> 0L,
      ("a", 3L) -> 200L, ("b", 1L) -> 500L))
  }

  test("a span wider than maxBuckets raises") {
    val rows = Seq((1L, 0L, "a", 1.0), (1L, 86400000L * 50, "a", 1.0))
    val e = intercept[Exception](
      EventOps.denseSeries(ev(rows), maxBuckets = 10L).collect())
    assert(e.getMessage.contains("maxBuckets"))
  }

  // ── velocity ──────────────────────────────────────────────────────────

  test("burst counting matches brute force; sub-threshold users drop") {
    val rnd = new scala.util.Random(208)
    val rows = (0 until 300).map { i =>
      ((i % 9).toLong + 1, rnd.nextInt(100000).toLong, "a", 1.0)
    }
    val winUs = 20000L * 1000L
    val got = EventOps.velocity(ev(rows), windowUs = winUs, minBurst = 4L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byU = rows.groupBy(_._1)
    for ((u, rs) <- byU) {
      val ts = rs.map(_._2 * 1000L).sorted
      val bursts = ts.map(t => ts.count(s => s > t - winUs && s <= t).toLong)
      val peak = bursts.max
      if (peak >= 4L)
        assert(got(u) == ((peak, bursts.count(_ >= 4L).toLong)), s"user $u")
      else assert(!got.contains(u), s"user $u must drop")
    }
  }

  // ── cumulativeUsers ───────────────────────────────────────────────────

  test("cumulative users: first-touch property against brute force") {
    val rnd = new scala.util.Random(209)
    val day = 86400000L
    val rows = (0 until 400).map { _ =>
      (rnd.nextInt(40).toLong + 1, rnd.nextInt(30).toLong * day, "a", 1.0)
    }
    val got = EventOps.cumulativeUsers(ev(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val firstDay = rows.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2 / day).min
    }
    val newPer = firstDay.groupBy(_._2).map { case (d, us) => d -> us.size.toLong }
    assert(got.keySet == newPer.keySet)
    for ((d, n) <- newPer) {
      val cum = firstDay.values.count(_ <= d).toLong
      assert(got(d) == ((n, cum)), s"day $d")
    }
    assert(got.values.map(_._2).max == firstDay.size.toLong,
      "final cumulative equals total distinct users")
  }

  test("equal timestamps all see each other (RANGE, not ROWS)") {
    val rows = Seq((1L, 1000L, "a", 1.0), (1L, 1000L, "a", 1.0),
      (1L, 1000L, "a", 1.0))
    val got = EventOps.velocity(ev(rows), windowUs = 1L, minBurst = 3L)
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L
      && got.head.getLong(2) == 3L)
  }
}

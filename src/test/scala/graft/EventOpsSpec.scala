package graft

import org.apache.spark.sql.DataFrame

import graft.events.EventOps

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, ts-ns, user_id, value); helper builds the events schema the
  // operators expect (ts as Long nanoseconds, like nanosAsLong parquet reads)
  private def events(rows: (Long, Long, Long, Double)*): DataFrame =
    rows.map { case (id, tsSec, uid, v) => (id, tsSec * 1000000000L, uid, v) }
      .toDF("event_id", "ts", "user_id", "value")

  test("trailing window sums [t-600s, t] per user, brute-force checked") {
    val raw = Seq(
      (0L, 0L, 1L, 1.0), (1L, 300L, 1L, 2.0), (2L, 600L, 1L, 4.0),
      (3L, 601L, 1L, 8.0), (4L, 1300L, 1L, 16.0),
      (5L, 0L, 2L, 32.0), (6L, 10000L, 2L, 64.0))
    val out = EventOps.trailingWindow(events(raw: _*), windowSec = 600)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // brute force oracle
    for ((id, t, u, _) <- raw) {
      val in = raw.filter { case (_, t2, u2, _) => u2 == u && t2 >= t - 600 && t2 <= t }
      val expSum = in.map(x => math.floor(x._4 * 100).toLong).sum
      assert(out(id) == ((expSum, in.size.toLong)), s"event $id")
    }
  }

  test("ties at identical timestamps are window peers (RANGE semantics)") {
    val out = EventOps.trailingWindow(
      events((0L, 100L, 1L, 1.0), (1L, 100L, 1L, 2.0)), windowSec = 600)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) == 300 && out(1L) == 300) // both see both
  }

  test("sessionize splits on gaps > gapSec, numbers sessions per user") {
    val out = EventOps.sessionize(events(
        (0L, 0L, 1L, 0.0), (1L, 100L, 1L, 0.0),  // session 1
        (2L, 2000L, 1L, 0.0),                    // gap 1900 > 1800 → session 2
        (3L, 3000L, 1L, 0.0),                    // gap 1000 → still session 2
        (4L, 0L, 2L, 0.0)), gapSec = 1800)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("sessionIntervals materializes sessionize's boundaries and sizes") {
    val out = EventOps.sessionIntervals(events(
        (0L, 0L, 1L, 0.0), (1L, 100L, 1L, 0.0),
        (2L, 2000L, 1L, 0.0), (3L, 3000L, 1L, 0.0),
        (4L, 7L, 2L, 0.0)), gapSec = 1800)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      (1L, 1L) -> ((0L, 100000000L, 2L)),
      (1L, 2L) -> ((2000000000L, 3000000000L, 2L)),
      (2L, 1L) -> ((7000000L, 7000000L, 1L))))
  }

  test("debounce drops events within windowSec of their raw same-(user,type) predecessor") {
    val ev = Seq(
      (0L, 0L, 1L, "c"), (1L, 30L, 1L, "c"),  // 30s gap <= 60 -> dropped
      (2L, 95L, 1L, "c"),  // 65s after event 1 (raw predecessor) -> kept
      (3L, 10L, 1L, "v"),  // other type: own partition, kept
      (4L, 20L, 2L, "c"))  // other user, kept
      .map { case (id, s, u, ty) => (id, s * 1000000000L, u, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val kept = EventOps.debounce(ev, windowSec = 60)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L, 2L, 3L, 4L))
  }

  test("activityStreaks: consecutive active days group into maximal islands") {
    val day = 86400L
    val ev = events(
      // user 1: days 0,1,2 (two events on day 1 — dedup), then 5,6
      (0L, 0L, 1L, 0.0), (1L, day + 10L, 1L, 0.0), (2L, day + 20L, 1L, 0.0),
      (3L, 2 * day, 1L, 0.0), (4L, 5 * day, 1L, 0.0), (5L, 6 * day + 100L, 1L, 0.0),
      // user 2: one isolated day
      (6L, 9 * day, 2L, 0.0))
    val out = EventOps.activityStreaks(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 3L),   // days 0-2
      (1L, 5L, 6L, 2L),   // days 5-6
      (2L, 9L, 9L, 1L)))
  }

  test("gapStats: exact lower-median / min / max inter-arrival gaps in ms") {
    val ev = Seq(
      (0L, 0L, 1L), (1L, 10L, 1L), (2L, 30L, 1L), (3L, 100L, 1L),
      (4L, 5L, 2L))  // single event: no gaps, absent from output
      .map { case (id, s, u) => (id, s * 1000000000L, u, "x", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.gapStats(ev).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // user 1 gaps: 10s, 20s, 70s -> n=3, min=10000ms, med=20000, max=70000
    assert(out == Map(1L -> ((3L, 10000L, 20000L, 70000L))))
  }

  test("typeNgrams counts contiguous type sequences per user, n=2 equals transitions") {
    val raw = Seq(
      (0L, 10L, 1L, "a"), (1L, 20L, 1L, "b"), (2L, 30L, 1L, "a"),
      (3L, 40L, 1L, "b"), (4L, 10L, 2L, "a"), (5L, 20L, 2L, "b"))
    val ev = raw.map { case (id, s, u, ty) => (id, s * 1000000000L, u, ty, 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val tri = EventOps.typeNgrams(ev, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    // user 1: a b a b -> (a,b,a), (b,a,b); user 2 too short
    assert(tri == Map(("a", "b", "a") -> 1L, ("b", "a", "b") -> 1L))
    val bi = EventOps.typeNgrams(ev, 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val trans = EventOps.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == trans)
  }

  test("ns-to-us conversion truncates toward zero, matching DuckDB's parquet reader") {
    // DuckDB reads TIMESTAMP(NANOS) parquet by truncation (-1500 ns -> -1 us,
    // -1 ns -> 0); the operators' `ts div 1000` must agree at every
    // timestamp INCLUDING pre-1970 ones — a floor division would not
    val out = spark.sql(
      """SELECT CAST(-1500 div 1000 AS BIGINT), CAST(-1 div 1000 AS BIGINT),
        |       CAST(999 div 1000 AS BIGINT), CAST(-999999 div 1000 AS BIGINT)"""
        .stripMargin).collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((-1L, 0L, 0L, -999L)))
  }

  test("funnel: earliest stage times, STRICT ordering, nullable tail stages") {
    val raw = Seq(
      // user 1: view@10 click@20 purchase@30 — full funnel
      (0L, 10L, 1L, "view"), (1L, 20L, 1L, "click"), (2L, 30L, 1L, "purchase"),
      // user 2: click BEFORE the first view never counts; the purchase
      // can't count either (no click stage reached)
      (3L, 5L, 2L, "click"), (4L, 10L, 2L, "view"), (5L, 20L, 2L, "purchase"),
      // user 3: click at the SAME instant as view — not strictly after
      (6L, 10L, 3L, "view"), (7L, 10L, 3L, "click"),
      // user 4: never viewed → absent from the funnel entirely
      (8L, 10L, 4L, "purchase"),
      // user 5: purchase before the click → t_purchase null
      (9L, 10L, 5L, "view"), (10L, 20L, 5L, "click"), (11L, 15L, 5L, "purchase"))
    val df = raw.map { case (id, tsSec, uid, ty) =>
      (id, tsSec * 1000000000L, uid, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.funnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    def us(s: Long) = s * 1000000L
    assert(out.keySet == Set(1L, 2L, 3L, 5L))
    assert(out(1L) == ((us(10), us(20), us(30))))
    assert(out(2L) == ((us(10), -1L, -1L)))
    assert(out(3L) == ((us(10), -1L, -1L)))
    assert(out(5L) == ((us(10), us(20), -1L)))
  }

  test("transitions: consecutive-pair counts per user, time order with id tiebreak") {
    val raw = Seq(
      (0L, 10L, 1L, "view"), (1L, 20L, 1L, "click"), (2L, 30L, 1L, "view"),
      (3L, 10L, 2L, "view"), (4L, 20L, 2L, "click"),
      (5L, 10L, 3L, "purchase")) // single event: no transition
    val df = raw.map { case (id, tsSec, uid, ty) =>
      (id, tsSec * 1000000000L, uid, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.transitions(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("view", "click") -> 2L, ("click", "view") -> 1L), s"got $out")
  }

  test("retention: cohort by first bucket, distinct-active per offset") {
    val wk = 604800L // bucket = 1 week of seconds
    val raw = Seq(
      // user 1: first active wk0; active wk0 (twice), wk1
      (0L, 10L, 1L, 0.0), (1L, 20L, 1L, 0.0), (2L, wk + 5L, 1L, 0.0),
      // user 2: first active wk0; active wk0, wk2
      (3L, 30L, 2L, 0.0), (4L, 2 * wk + 1L, 2L, 0.0),
      // user 3: first active wk1 — its own cohort
      (5L, wk + 50L, 3L, 0.0))
    val out = EventOps.retention(events(raw: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // users 1,2 in cohort 0 at offset 0 (dup event collapsed)
      (0L, 1L) -> 1L, // user 1 returned in week 1
      (0L, 2L) -> 1L, // user 2 returned in week 2
      (1L, 0L) -> 1L), s"got $out") // user 3's own cohort
  }
}

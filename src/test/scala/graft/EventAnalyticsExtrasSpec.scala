package graft

import org.apache.spark.sql.DataFrame

import graft.events.EventOps
import graft.operators.TableOps

/** Unit gates for the round-10 event-analytics additions: SCD2 interval
  * construction, ordered user paths, half-life decayed scores, and
  * mode-per-group — each against a hand-computed closed form on micro
  * fixtures (the DuckDB replay at sf0.01 is the corpus-level gate). */
class EventAnalyticsExtrasSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.map { case (id, tsSec, uid, ty, v) => (id, tsSec * 1000000000L, uid, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  private def us(s: Long) = s * 1000000L

  // ── SCD2 ──────────────────────────────────────────────────────────────

  test("scd2 collapses consecutive equal states and closes intervals at the next change") {
    val out = EventOps.scd2(events(
        (0L, 10L, 1L, "view", 0.0),
        (1L, 20L, 1L, "view", 0.0),   // same state → same run, collapsed
        (2L, 30L, 1L, "click", 0.0),  // change → closes the view run at 30
        (3L, 40L, 1L, "view", 0.0),   // state may RECUR in a later run
        (4L, 99L, 2L, "buy", 0.0)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "view", us(10), us(30)),
      (1L, "click", us(30), us(40)),
      (1L, "view", us(40), -1L),
      (2L, "buy", us(99), -1L)))
  }

  test("scd2 same-timestamp changes order by event_id (deterministic zero-width interval)") {
    val out = EventOps.scd2(events(
        (7L, 10L, 1L, "b", 0.0), (3L, 10L, 1L, "a", 0.0)))
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    // event_id 3 ("a") precedes 7 ("b") at the tied instant
    assert(out.toSeq == Seq(("a", us(10), us(10)), ("b", us(10), -1L)))
  }

  // ── user paths ────────────────────────────────────────────────────────

  test("userPaths joins the first maxEvents types in (time, event_id) order; n_events counts ALL") {
    val out = EventOps.userPaths(events(
        (0L, 10L, 1L, "view", 0.0), (1L, 30L, 1L, "buy", 0.0),
        (2L, 20L, 1L, "click", 0.0),        // out-of-id time order
        (3L, 40L, 1L, "view", 0.0),
        (4L, 5L, 2L, "click", 0.0)), maxEvents = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("view>click>buy", 4L)))  // capped at 3, count is 4
    assert(out(2L) == (("click", 1L)))
  }

  test("userPaths ties at one instant break by event_id") {
    val out = EventOps.userPaths(events(
        (9L, 10L, 1L, "b", 0.0), (2L, 10L, 1L, "a", 0.0)))
      .collect().map(r => r.getString(1))
    assert(out.toSeq == Seq("a>b"))
  }

  // ── decayed score ─────────────────────────────────────────────────────

  test("decayedScore: integer permille half-life weights, saturating to 0 past bucket 20") {
    val day = 86400L
    val out = EventOps.decayedScore(events(
        // user 1: newest event (k=0, w=1000), one a day old (k=1, w=500),
        // one 2.5 days old (k=2, w=250), one 30 days old (k=20+, w=0)
        (0L, 100L * day, 1L, "e", 2.0),
        (1L, 99L * day, 1L, "e", 4.0),
        (2L, 100L * day - 216000L, 1L, "e", 8.0),
        (3L, 70L * day, 1L, "e", 1000.0),
        // user 2: only an old event — score 0 but the row still appears
        (4L, 1L * day, 2L, "e", 5.0)))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((200L * 1000 + 400L * 500 + 800L * 250, 4L)))
    assert(out(2L) == ((0L, 1L)))
  }

  test("decayedScore weight table is exactly 1000 >> k (truncating integer halving)") {
    // 1000 → 500 → 250 → 125 → 62 → 31 → 15 → 7 → 3 → 1 → 0 (k=10) — the
    // permille ladder the oracle's `1000 // (1 << k)` must reproduce
    val day = 86400L
    val rows = (0 to 11).map(k =>
      (k.toLong, (100L - k) * day, 10L + k, "e", 0.01)) // 1 cent each
    val out = EventOps.decayedScore(events(rows: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ladder = Seq(1000L, 500, 250, 125, 62, 31, 15, 7, 3, 1, 0, 0)
    for (k <- 0 to 11) assert(out(10L + k) == ladder(k), s"k=$k")
  }

  // ── mode per group ────────────────────────────────────────────────────

  test("modePerGroup: highest count wins; ties break to the smaller value") {
    val out = TableOps.modePerGroup(events(
        (0L, 1L, 1L, "view", 0.0), (1L, 2L, 1L, "view", 0.0),
        (2L, 3L, 1L, "click", 0.0),
        // user 2: 2×"b", 2×"a" — tie → "a"
        (3L, 1L, 2L, "b", 0.0), (4L, 2L, 2L, "b", 0.0),
        (5L, 3L, 2L, "a", 0.0), (6L, 4L, 2L, "a", 0.0)),
        "user_id", "event_type")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out == Map(1L -> (("view", 2L)), 2L -> (("a", 2L))))
  }

  test("modePerGroup plans no rank window — two hash aggregations only") {
    val df = TableOps.modePerGroup(events((0L, 1L, 1L, "x", 0.0)),
      "user_id", "event_type")
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.operators.TableOps

/** [[EventOps.funnelLatency]] and [[TableOps.snapshotDiffColumns]]. */
class FunnelLatencyDiffSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.map { case ((u, ty, sec), i) =>
      (i.toLong, new Timestamp(sec * 1000L), u, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── funnelLatency ─────────────────────────────────────────────────────

  test("latency = first tail at-or-after the FIRST head event") {
    val rows = Seq(
      // u1: view@10, click@25 → 15s; click@25, purchase@100 → 75s
      (1L, "view", 10L), (1L, "click", 25L), (1L, "purchase", 100L),
      // u2: click@5 BEFORE first view@10 → no view→click conversion;
      // a second click@40 after the view converts at 30s
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 40L),
      // u3: view only → appears nowhere
      (3L, "view", 7L))
    val got = EventOps.funnelLatency(ev(rows), Seq("view", "click", "purchase"))
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // view→click: u1 15000ms, u2 30000ms → n=2, min 15000, med 15000
    assert(got(("view", "click")) == ((2L, 15000L, 15000L, 30000L)))
    // click→purchase: u2's first click is at 5 (before purchase? u2 has
    // no purchase) → only u1: 75000ms
    assert(got(("click", "purchase")) == ((1L, 75000L, 75000L, 75000L)))
  }

  test("property: stats match brute force across random funnels") {
    val rnd = new scala.util.Random(61)
    val types = Seq("view", "click", "purchase")
    val rows = for (u <- 1L to 40L; _ <- 1 to 8) yield
      (u, types(rnd.nextInt(3)), rnd.nextInt(1000).toLong)
    val got = EventOps.funnelLatency(ev(rows), types)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // brute force: note ev() assigns event_ids in sequence, but latency
    // only uses times, so ties on ts collapse to the same min
    val byUser = rows.groupBy(_._1)
    for (Seq(a, b) <- types.sliding(2)) {
      val lats = byUser.values.flatMap { es =>
        val ta = es.filter(_._2 == a).map(_._3 * 1000000L).minOption
        ta.flatMap(t => es.filter(e => e._2 == b && e._3 * 1000000L >= t)
          .map(e => (e._3 * 1000000L - t) / 1000L).minOption)
      }.toSeq.sorted
      if (lats.isEmpty) assert(!got.contains((a, b)))
      else {
        val (n, mn, mx) = (lats.size.toLong, lats.head, lats.last)
        val med = lats((((n + 1) / 2) - 1).toInt)
        assert(got((a, b)) == ((n, mn, med, mx)), s"pair ($a, $b)")
      }
    }
  }

  test("rejects duplicate or too-few stages") {
    val df = ev(Seq((1L, "view", 1L)))
    intercept[IllegalArgumentException](
      EventOps.funnelLatency(df, Seq("view")))
    intercept[IllegalArgumentException](
      EventOps.funnelLatency(df, Seq("view", "view")))
  }

  // ── snapshotDiffColumns ───────────────────────────────────────────────

  test("per-column blame: only differing columns of changed keys appear") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val nw = Seq((1L, "a", 11L), (2L, "B", 21L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val got = TableOps.snapshotDiffColumns(old, nw, "k")
      .as[(Long, String, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "v", "10", "11"),
      (2L, "s", "b", "B"), (2L, "v", "20", "21")))
    // key 3 (removed) and key 4 (added) have no column-wise blame
  }

  test("NULL transitions are differences and keep the NULL side NULL") {
    val old = Seq((1L, Some("x")), (2L, Option.empty[String]))
      .toDF("k", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Some("y")))
      .toDF("k", "s")
    val got = TableOps.snapshotDiffColumns(old, nw, "k").collect()
      .map(r => (r.getLong(0), Option(r.getString(2)), Option(r.getString(3))))
    assert(got.toSeq == Seq((1L, Some("x"), None), (2L, None, Some("y"))))
  }

  test("unchanged keys never reach the per-column explode") {
    val old = Seq((1L, "same", 5L), (2L, "x", 6L)).toDF("k", "s", "v")
    val nw = Seq((1L, "same", 5L), (2L, "y", 6L)).toDF("k", "s", "v")
    val got = TableOps.snapshotDiffColumns(old, nw, "k")
      .as[(Long, String, String, String)].collect().toSeq
    assert(got == Seq((2L, "s", "x", "y")))
  }

  test("rejects mismatched schemas") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException](
      TableOps.snapshotDiffColumns(a, b, "k"))
  }
}

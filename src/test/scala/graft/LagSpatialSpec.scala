package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.operators.Spatial

/** [[EventOps.lagStats]] and [[Spatial.radiusJoin]]. */
class LagSpatialSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── lagStats ──────────────────────────────────────────────────────────

  test("lag stats match the brute-force pairing on a gapped series") {
    // two types; type a has a gap at day 5
    val days = Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L)
    val rows = days.map(d => ("a", d, (d * 3 + 1).toDouble)) ++
      (0L until 6L).map(d => ("b", d, (10 - d).toDouble))
    val got = EventOps.lagStats(ev(rows), maxLag = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    val series = rows.groupBy(_._1).map { case (ty, rs) =>
      ty -> rs.map(r => r._2 -> (r._3 * 100).toLong).toMap
    }
    for (ty <- Seq("a", "b"); lag <- 1L to 3L) {
      val s = series(ty)
      val pairs = s.keys.toSeq.filter(d => s.contains(d - lag))
        .map(d => (s(d), s(d - lag)))
      if (pairs.isEmpty) assert(!got.contains((ty, lag)))
      else assert(got((ty, lag)) == ((pairs.size.toLong,
        pairs.map(_._1).sum, pairs.map(_._2).sum,
        pairs.map(p => p._1 * p._2).sum,
        pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum)), s"$ty lag $lag")
    }
  }

  test("a gap never pairs across itself") {
    // days 0 and 2 only: lag 1 has no pairs at all, lag 2 exactly one
    val got = EventOps.lagStats(ev(Seq(("a", 0L, 1.0), ("a", 2L, 2.0))),
      maxLag = 2).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L))
    assert(got.head.getLong(2) == 1L && got.head.getLong(5) == 20000L)
  }

  test("a daily sum past the Int64 x-squared bound raises") {
    val e = intercept[Exception](
      EventOps.lagStats(ev(Seq(("a", 0L, 96e7), ("a", 1L, 1.0))))
        .collect())
    assert(e.getMessage.contains("overflows"))
  }

  test("per-value-legal series whose SUM leaves Int64 raises at the cast back") {
    // three days at 3.0e9 cents each: every x² term fits Int64 but the
    // 2-pair lag-1 sum_x2 = 1.8e19 does not — the decimal check fires
    val rows = (0L until 3L).map(d => ("a", d, 3.0e7))
    val e = intercept[Exception](EventOps.lagStats(ev(rows)).collect())
    assert(e.getMessage.contains("overflows Int64"))
  }

  test("large-but-legal values aggregate exactly through the decimal path") {
    // two days at 2e9 cents: lag-1 pair sums x², xy = 4e18 — inside Int64
    val rows = Seq(("a", 0L, 2.0e7), ("a", 1L, 2.0e7))
    val got = EventOps.lagStats(ev(rows), maxLag = 1).collect().head
    assert(got.getLong(5) == 4000000000000000000L) // sum_xy
    assert(got.getLong(6) == 4000000000000000000L) // sum_x2
  }

  // ── radiusJoin ────────────────────────────────────────────────────────

  test("property: grid join equals the all-pairs filter, exactly once") {
    val rnd = new scala.util.Random(191)
    val pts = (1L to 400L).map(i =>
      (i, rnd.nextInt(2000).toLong - 1000L, rnd.nextInt(2000).toLong - 1000L))
    val got = Spatial.radiusJoin(pts.toDF("id", "x", "y"),
      "id", "x", "y", radius = 120L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    val want = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= 120L * 120L
    } yield (a._1, b._1) -> d2).toMap
    assert(got.length == got.toMap.size, "a pair joined more than once")
    assert(got.toMap == want)
  }

  test("boundary: pairs at exactly distance r and r+1 across a cell edge") {
    // cell width 10: (9,0)-(19,0) straddle cells at exactly distance 10;
    // (0,0)-(11,0) exceed it
    val pts = Seq((1L, 9L, 0L), (2L, 19L, 0L), (3L, 0L, 0L), (4L, 11L, 0L))
    val got = Spatial.radiusJoin(pts.toDF("id", "x", "y"),
      "id", "x", "y", radius = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((3L, 4L)))
    // (1,3) at distance 9 and (2,4) at distance 8 are in
    assert(got == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    val pts = Seq((1L, -1L, 0L), (2L, 1L, 0L))
    val got = Spatial.radiusJoin(pts.toDF("id", "x", "y"),
      "id", "x", "y", radius = 5L).collect()
    assert(got.length == 1 && got.head.getLong(2) == 4L)
  }

  test("rejects a radius outside the exactness bound") {
    val df = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", 0L))
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", 2000000000L))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.operators.TableOps

/** [[EventOps.periodDeltas]] and [[TableOps.equiDepthScores]]. */
class PeriodRfmSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  // ── periodDeltas ──────────────────────────────────────────────────────

  test("dense series: both deltas are exact; heads are NULL") {
    val rows = (0L until 10L).map(d => ("a", d, (d + 1).toDouble))
    val got = EventOps.periodDeltas(ev(rows)).collect()
      .map(r => r.getLong(1) -> r).toMap
    // day 0: no prev, no prev period
    assert(got(0L).isNullAt(3) && got(0L).isNullAt(5))
    // day 5: dod = 100, no week-ago yet
    assert(got(5L).getLong(4) == 100L && got(5L).isNullAt(5))
    // day 8: dod = 100, wow vs day 1 = 700
    assert(got(8L).getLong(4) == 100L && got(8L).getLong(6) == 700L)
  }

  test("a gapped series never compares against the wrong week") {
    // days 0..3 then 7..10: day 8's week-ago is day 1 (present); day
    // 11 absent; day 10's week-ago is day 3 (present); day 7's prev
    // day 6 is MISSING → dod NULL even though a positional lag would
    // have found day 3
    val rows = (Seq(0L, 1L, 2L, 3L, 7L, 8L, 9L, 10L)).map(d =>
      ("a", d, 1.0 + d))
    val got = EventOps.periodDeltas(ev(rows)).collect()
      .map(r => r.getLong(1) -> r).toMap
    assert(got(7L).isNullAt(3), "day 7 must not take day 3 as 'previous'")
    assert(got(8L).getLong(6) == got(8L).getLong(2) - got(1L).getLong(2))
    assert(got(3L).isNullAt(5), "day 3 has no week-ago")
  }

  // ── equiDepthScores ───────────────────────────────────────────────────

  test("property: scores match the rows-below rule per metric") {
    val rnd = new scala.util.Random(89)
    val rows = (1L to 300L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
    val got = TableOps.equiDepthScores(rows.toDF("id", "a", "b"),
      Seq("a", "b"), nBuckets = 5).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("a_score"), r.getAs[Long]("b_score"))).toMap
    val (as, bs) = (rows.map(_._2), rows.map(_._3))
    rows.foreach { case (id, a, b) =>
      val wantA = as.count(_ < a).toLong * 5 / as.size
      val wantB = bs.count(_ < b).toLong * 5 / bs.size
      assert(got(id) == ((wantA, wantB)), s"id $id")
    }
  }

  test("ties share a bucket; scores cover 0..n-1 on uniform data") {
    val rows = (0L until 100L).map(i => (i, i / 10)) // 10 copies each
    val got = TableOps.equiDepthScores(rows.toDF("id", "v"), Seq("v"), 5)
      .select("v", "v_score").as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L, 1L, 2L, 3L, 4L))
    // all copies of one value share a score
    assert(got.size == 10)
  }

  test("NULL metrics score NULL; empty metric column yields NULL scores") {
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "v")
    val got = TableOps.equiDepthScores(df, Seq("v"), 2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(1L) == Some(0L) && got(2L) == None)
  }

  test("rejects non-BIGINT, duplicate, or colliding columns") {
    val df = Seq((1L, "s")).toDF("v", "s")
    intercept[IllegalArgumentException](
      TableOps.equiDepthScores(df, Seq("s"), 5))
    intercept[IllegalArgumentException](
      TableOps.equiDepthScores(df, Seq("v", "v"), 5))
    intercept[IllegalArgumentException](
      TableOps.equiDepthScores(df.withColumn("v_score", lit(1L)),
        Seq("v"), 5))
  }
}

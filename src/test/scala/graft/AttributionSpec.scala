package graft

import java.sql.Timestamp

import graft.events.EventOps

/** Linear attribution: window edges, equal-split fractions, user
  * isolation — vs a plain-Scala reference. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val W = 1000000L // 1-second lookback in microseconds

  private def df(rows: Seq[(Long, Long, String, Long, Double)]) =
    rows.map { case (u, id, ty, us, v) =>
      (u, id, ty, new Timestamp(us / 1000L), v)
    }.toDF("user_id", "event_id", "event_type", "ts", "value")

  private def run(rows: Seq[(Long, Long, String, Long, Double)])
      : Map[(Long, Long), (String, Long, Long)] =
    EventOps.linearAttribution(df(rows), "buy", Seq("ad"), W)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getString(3), r.getLong(4), r.getLong(5)))).toMap

  private def ref(rows: Seq[(Long, Long, String, Long, Double)])
      : Map[(Long, Long), (String, Long, Long)] = {
    val convs = rows.filter(_._3 == "buy")
    val touches = rows.filter(_._3 == "ad")
    (for {
      (u, cid, _, cts, v) <- convs
      inWin = touches.filter(t => t._1 == u && cts - W <= t._4 && t._4 < cts)
      (_, tid, ty, _, _) <- inWin
    } yield (cid, tid) -> ((ty, math.floor(v * 100).toLong, inWin.size.toLong)))
      .toMap
  }

  test("hand example: equal split, window edges inclusive-exclusive") {
    val rows = Seq(
      (1L, 10L, "ad", 1000000L, 0.0),   // exactly cts - W: IN
      (1L, 11L, "ad", 1500000L, 0.0),   // inside: IN
      (1L, 12L, "ad", 2000000L, 0.0),   // exactly cts: OUT (strict <)
      (1L, 13L, "ad", 100000L, 0.0),    // too old: OUT
      (1L, 20L, "buy", 2000000L, 7.50))
    val got = run(rows)
    assert(got == Map(
      (20L, 10L) -> (("ad", 750L, 2L)),
      (20L, 11L) -> (("ad", 750L, 2L))))
  }

  test("a conversion with no touches is absent; other users never credit") {
    val rows = Seq(
      (2L, 30L, "ad", 1500000L, 0.0),   // user 2's touch
      (1L, 21L, "buy", 2000000L, 5.0))  // user 1's conversion
    assert(run(rows).isEmpty)
  }

  test("matches the reference on random event streams") {
    val rng = new scala.util.Random(101L)
    val rows = Seq.tabulate(300) { i =>
      val ty = rng.nextInt(3) match {
        case 0 => "ad"; case 1 => "buy"; case _ => "other"
      }
      (rng.nextInt(5).toLong, i.toLong, ty,
        rng.nextInt(20).toLong * 100000L, rng.nextInt(10000) / 100.0)
    }
    assert(run(rows) == ref(rows))
  }

  test("parameters are validated") {
    val d = df(Seq((1L, 1L, "ad", 1000000L, 1.0)))
    intercept[IllegalArgumentException](
      EventOps.linearAttribution(d, "buy", Seq.empty, W))
    intercept[IllegalArgumentException](
      EventOps.linearAttribution(d, "buy", Seq("buy"), W))
    intercept[IllegalArgumentException](
      EventOps.linearAttribution(d, "buy", Seq("ad"), 0L))
  }

  private def runPos(rows: Seq[(Long, Long, String, Long, Double)])
      : Map[(Long, Long), (String, Long, Long)] =
    EventOps.positionAttribution(df(rows), "buy", Seq("ad"), W)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getString(4), r.getLong(5), r.getLong(6)))).toMap

  test("position attribution: only / half / U-shaped splits as exact fractions") {
    def touch(id: Long, us: Long) = (1L, id, "ad", us, 0.0)
    // n = 1: everything
    assert(runPos(Seq(touch(10, 1500000L), (1L, 20L, "buy", 2000000L, 3.00)))
      == Map((20L, 10L) -> (("only", 300L * 1000L, 1000L))))
    // n = 2: halves
    val two = runPos(Seq(touch(10, 1200000L), touch(11, 1500000L),
      (1L, 20L, "buy", 2000000L, 3.00)))
    assert(two((20L, 10L)) == (("half", 300L * 500L, 1000L)))
    assert(two((20L, 11L)) == (("half", 300L * 500L, 1000L)))
    // n = 4: 400 / 200/2 / 200/2 / 400 — credits sum to exactly cents
    val four = runPos(Seq(touch(10, 1100000L), touch(11, 1200000L),
      touch(12, 1300000L), touch(13, 1400000L),
      (1L, 20L, "buy", 2000000L, 3.00)))
    assert(four((20L, 10L)) == (("first", 300L * 400L, 1000L)))
    assert(four((20L, 13L)) == (("last", 300L * 400L, 1000L)))
    assert(four((20L, 11L)) == (("middle", 300L * 200L, 2000L)))
    assert(four((20L, 12L)) == (("middle", 300L * 200L, 2000L)))
    // total credit = cents exactly: 2·(400/1000) + 2·(200/2000) = 1
    val total = four.values.map { case (_, n, d) => BigDecimal(n) / d }.sum
    assert(total == BigDecimal(300))
  }

  test("position attribution: timestamp ties break by touch_id") {
    val rows = Seq((1L, 11L, "ad", 1500000L, 0.0), (1L, 10L, "ad", 1500000L, 0.0),
      (1L, 12L, "ad", 1500000L, 0.0), (1L, 20L, "buy", 2000000L, 1.00))
    val got = runPos(rows)
    assert(got((20L, 10L))._1 == "first")
    assert(got((20L, 12L))._1 == "last")
    assert(got((20L, 11L))._1 == "middle")
  }
}

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
}

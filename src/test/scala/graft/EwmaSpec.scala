package graft

import java.sql.Timestamp

import graft.events.EventOps

/** Exact fixed-point EWMA vs a plain-Scala fold — same integer
  * arithmetic, so parity is cell-exact. */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def df(rows: Seq[(Long, Long, Long, Double)]) =
    rows.map { case (u, id, sec, v) => (u, id, ts(sec), v) }
      .toDF("user_id", "event_id", "ts", "value")

  // the same fold: cents floor, (ts, id) ascending over the last n
  private def ref(rows: Seq[(Long, Long, Long, Double)],
                  an: Long, ad: Long, n: Int): Map[Long, (Long, Long)] =
    rows.groupBy(_._1).map { case (u, evs) =>
      val vs = evs.sortBy(e => (-e._3, -e._2)).take(n)
        .sortBy(e => (e._3, e._2))
        .map(e => math.floor(e._4 * 100).toLong)
      u -> (vs.size.toLong, vs.reduce((acc, v) => (an * v + (ad - an) * acc) / ad))
    }

  private def run(rows: Seq[(Long, Long, Long, Double)],
                  an: Long, ad: Long, n: Int): Map[Long, (Long, Long)] =
    EventOps.ewma(df(rows), an, ad, n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hand example: y1 = v1, then (3v + 7y) div 10") {
    // cents 400, 600, 800 → 400, (1800+2800)/10 = 460, (2400+3220)/10 = 562
    val rows = Seq((1L, 1L, 10L, 4.0), (1L, 2L, 20L, 6.0), (1L, 3L, 30L, 8.0))
    assert(run(rows, 3, 10, 32) == Map(1L -> (3L, 562L)))
  }

  test("lastN keeps only the newest events") {
    val rows = Seq((1L, 1L, 10L, 999.0), (1L, 2L, 20L, 4.0), (1L, 3L, 30L, 6.0))
    // n=2 drops the 999: fold over (4.0, 6.0) → (1800 + 2800) div 10 = 460
    assert(run(rows, 3, 10, 2) == Map(1L -> (2L, 460L)))
  }

  test("equal timestamps break by event_id") {
    val rows = Seq((1L, 2L, 10L, 6.0), (1L, 1L, 10L, 4.0))
    // order is id 1 then id 2: y = (3·600 + 7·400) div 10 = 460, not 540
    assert(run(rows, 3, 10, 32) == Map(1L -> (2L, 460L)))
  }

  test("alpha = 1 reduces to the last value; users fold independently") {
    val rows = Seq((1L, 1L, 10L, 5.0), (1L, 2L, 20L, 9.0),
      (2L, 3L, 10L, 7.0))
    assert(run(rows, 1, 1, 32) == Map(1L -> (2L, 900L), 2L -> (1L, 700L)))
  }

  test("matches the reference fold on random histories (incl. > lastN)") {
    val rng = new scala.util.Random(53L)
    val rows = Seq.fill(400)((rng.nextInt(6).toLong, rng.nextLong(1000000),
      rng.nextInt(100).toLong, rng.nextInt(100000) / 100.0))
    for ((an, ad, n) <- Seq((3L, 10L, 32), (1L, 2L, 5), (9L, 10L, 200)))
      assert(run(rows, an, ad, n) == ref(rows, an, ad, n), s"a=$an/$ad n=$n")
  }

  test("negative cents raise (truncate vs floor divergence)") {
    intercept[Exception] { run(Seq((1L, 1L, 10L, -0.5)), 3, 10, 32) }
  }

  test("parameters are validated") {
    val d = df(Seq((1L, 1L, 10L, 1.0)))
    intercept[IllegalArgumentException] { EventOps.ewma(d, 0, 10, 32) }
    intercept[IllegalArgumentException] { EventOps.ewma(d, 11, 10, 32) }
    intercept[IllegalArgumentException] { EventOps.ewma(d, 3, 10, 0) }
  }
}

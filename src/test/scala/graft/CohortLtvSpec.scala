package graft

import java.sql.Timestamp

import graft.events.EventOps

/** Cohort LTV: first-day cohorts, sparse age curve, exact cumulative. */
class CohortLtvSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000L // one day in MILLISECONDS for Timestamp

  private def df(rows: Seq[(Long, String, Long, Double)]) =
    rows.map { case (u, ty, day, v) =>
      (u, ty, new Timestamp(day * Day + 1000L), v)
    }.toDF("user_id", "event_type", "ts", "value")

  private def run(rows: Seq[(Long, String, Long, Double)])
      : Seq[(Long, Long, Long, Long, Long)] =
    EventOps.cohortLtv(df(rows), "buy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("hand example: cohorts by first activity, cumulative over sparse ages") {
    val rows = Seq(
      // user 1: first day 0 (a view), buys on days 0 and 2
      (1L, "view", 0L, 0.0), (1L, "buy", 0L, 1.00), (1L, "buy", 2L, 2.00),
      // user 2: also cohort 0, buys on day 2
      (2L, "view", 0L, 0.0), (2L, "buy", 2L, 5.00),
      // user 3: cohort 1, never buys — counts in n_users only
      (3L, "view", 1L, 0.0))
    // cohort 0 (2 users): age 0 rev 100, age 2 rev 200+500 → cum 100, 800
    assert(run(rows) == Seq(
      (0L, 0L, 2L, 100L, 100L),
      (0L, 2L, 2L, 700L, 800L)))
  }

  test("a purchase can BE the first activity (age 0 revenue)") {
    val rows = Seq((1L, "buy", 5L, 3.00))
    assert(run(rows) == Seq((5L, 0L, 1L, 300L, 300L)))
  }

  test("matches a plain-Scala fold on random streams") {
    val rng = new scala.util.Random(103L)
    val rows = Seq.tabulate(400) { i =>
      (rng.nextInt(20).toLong, if (rng.nextBoolean()) "buy" else "view",
        rng.nextInt(15).toLong, rng.nextInt(10000) / 100.0)
    }
    val firsts = rows.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val sizes = firsts.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rev = rows.filter(_._2 == "buy")
      .groupBy(r => (firsts(r._1), r._3 - firsts(r._1)))
      .view.mapValues(_.map(r => math.floor(r._4 * 100).toLong).sum).toMap
    val expect = rev.keys.toSeq.sorted.map { case (c, a) =>
      val cum = rev.collect { case ((`c`, aa), v) if aa <= a => v }.sum
      (c, a, sizes(c), rev((c, a)), cum)
    }
    assert(run(rows) == expect)
  }
}

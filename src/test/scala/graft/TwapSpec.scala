package graft

import org.apache.spark.sql.functions._

import graft.events.EventOps

class TwapSpec extends SparkSpec {
  import spark.implicits._

  /** (event_id, user, tus µs, value-as-double) → events frame with raw-ns
    * Long ts (the nanosAsLong read path). */
  private def ev(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "tus", "value")
      .select(col("event_id"), col("user_id"), (col("tus") * 1000L).as("ts"),
        col("value"))

  test("hand example: long holds dominate bursts, exact fractions") {
    // u1: value 1.00 held 10s, then 3.00 held 5s, then a final event
    // (no interval). plain mean of cents = 200; TWAP = (100·10000 +
    // 300·5000) / 15000 ms
    val rows = Seq((1L, 1L, 0L, 1.0), (2L, 1L, 10000000L, 3.0),
      (3L, 1L, 15000000L, 9.0))
    val got = EventOps.timeWeightedAvg(ev(rows))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 100L * 10000 + 300L * 5000, 15000L)))
  }

  test("zero-length holds weigh nothing; single-event users are absent") {
    val rows = Seq(
      (1L, 1L, 5000000L, 2.0), (2L, 1L, 5000000L, 7.0), // tie: dt 0
      (3L, 1L, 6000000L, 1.0),
      (9L, 2L, 0L, 4.0)) // single event → no interval
    val got = EventOps.timeWeightedAvg(ev(rows))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // order within the tie: event_id 1 before 2; (2.0, dt 0) + (7.0, 1s)
    assert(got == Seq((1L, 2L, 700L * 1000, 1000L)))
  }

  test("property: matches a per-user fold on random event streams") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(8).toLong,
      rnd.nextInt(100000).toLong * 1000L, rnd.nextInt(300) / 100.0))
    val got = EventOps.timeWeightedAvg(ev(rows))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val expect = rows.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._1))
      val ivs = sorted.zip(sorted.tail).map { case (a, b) =>
        (math.floor(a._4 * 100).toLong, (b._3 - a._3) / 1000L)
      }
      if (ivs.isEmpty) None
      else Some(u -> (ivs.size.toLong,
        ivs.map(p => p._1 * p._2).sum, ivs.map(_._2).sum))
    }
    assert(got == expect)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.events.EventOps

class SlidingDistinctUsersSpec extends SparkSpec {
  import spark.implicits._

  /** (user, day) pairs → events frame with a raw-ns Long ts column (the
    * nanosAsLong read path EventOps adapts to). */
  private def eventsOf(pairs: Seq[(Long, Long)]) =
    pairs.toDF("user_id", "day")
      .select(col("user_id"), (col("day") * 86400000000L * 1000L).as("ts"))

  /** Brute force: for each observed day, count users active in the
    * trailing window — the definition, O(days × pairs). */
  private def naive(pairs: Seq[(Long, Long)], w: Int): Seq[(Long, Long)] = {
    val days = pairs.map(_._2).distinct.sorted
    days.map { d =>
      d -> pairs.filter { case (_, day) => day > d - w && day <= d }
        .map(_._1).distinct.size.toLong
    }
  }

  test("hand example: gaps, overlaps, and re-entry inside the window") {
    // u1 active days 0,1,9; u2 active 1; u3 active 8,9
    val pairs = Seq((1L, 0L), (1L, 1L), (1L, 9L), (2L, 1L), (3L, 8L), (3L, 9L))
    val got = EventOps.slidingDistinctUsers(eventsOf(pairs), windowDays = 7)
      .as[(Long, Long)].collect().toSeq
    // day 0: {u1}; day 1: {u1,u2}; day 8: {u3}(u1's last day 1 < 8-6=2);
    // day 9: {u1,u3}
    assert(got == Seq((0L, 1L), (1L, 2L), (8L, 1L), (9L, 2L)))
  }

  test("windowDays=1 degenerates to distinct users per day") {
    val pairs = Seq((1L, 5L), (2L, 5L), (1L, 6L), (1L, 5L))
    val got = EventOps.slidingDistinctUsers(eventsOf(pairs), windowDays = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, 2L), (6L, 1L)))
  }

  test("property: matches brute force across window sizes on random data") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextInt(40).toLong))
    val ev = eventsOf(pairs)
    for (w <- Seq(1, 2, 3, 7, 10, 40)) {
      val got = EventOps.slidingDistinctUsers(ev, windowDays = w)
        .as[(Long, Long)].collect().toSeq
      assert(got == naive(pairs, w), s"windowDays=$w mismatch")
    }
  }

  test("only a repeated delta pair per activity gap — duplicate events are free") {
    // the same (user, day) pair 1000 times must cost exactly what one
    // costs: the operator's exchange is over DISTINCT user-days
    val pairs = Seq.fill(1000)((1L, 3L)) ++ Seq((2L, 3L))
    val got = EventOps.slidingDistinctUsers(eventsOf(pairs), windowDays = 7)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 2L)))
  }

  test("rejects a non-positive window") {
    val e = intercept[IllegalArgumentException] {
      EventOps.slidingDistinctUsers(eventsOf(Seq((1L, 1L))), windowDays = 0)
    }
    assert(e.getMessage.contains("windowDays"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.events.AsOf
import graft.operators.Inventory

/** [[Inventory.fifoMatch]] and [[AsOf.forward]]. */
class FifoAsofSpec extends SparkSpec {
  import spark.implicits._

  private def lots(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("k", "id", "q", "seq")

  /** Scalar FIFO reference: walk both sequences with two cursors. */
  private def fifoRef(buys: Seq[(Long, Long, Long, Long)],
                      sells: Seq[(Long, Long, Long, Long)])
      : Map[(Long, Long, Long), Long] = {
    val out = scala.collection.mutable.Map[(Long, Long, Long), Long]()
    for (k <- (buys.map(_._1) ++ sells.map(_._1)).distinct) {
      var bs = buys.filter(_._1 == k).sortBy(r => (r._4, r._2))
        .map(r => (r._2, r._3)).toList
      var ss = sells.filter(_._1 == k).sortBy(r => (r._4, r._2))
        .map(r => (r._2, r._3)).toList
      while (bs.nonEmpty && ss.nonEmpty) {
        val m = math.min(bs.head._2, ss.head._2)
        out((k, bs.head._1, ss.head._1)) = m
        bs = if (bs.head._2 == m) bs.tail
             else (bs.head._1, bs.head._2 - m) :: bs.tail
        ss = if (ss.head._2 == m) ss.tail
             else (ss.head._1, ss.head._2 - m) :: ss.tail
      }
    }
    out.toMap
  }

  test("property: closed form equals the two-cursor FIFO walk") {
    val rnd = new scala.util.Random(201)
    val buys = (1L to 200L).map(i =>
      (i % 10, i, rnd.nextInt(50).toLong + 1, rnd.nextInt(1000).toLong))
    val sells = (1001L to 1120L).map(i =>
      (i % 10, i, rnd.nextInt(70).toLong + 1, rnd.nextInt(1000).toLong))
    for (bucket <- Seq(1L, 16L, 1000L)) {
      val got = Inventory.fifoMatch(lots(buys), lots(sells),
        "k", "id", "q", "seq", qtyBucket = bucket).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      assert(got.length == got.toMap.size, s"duplicate pair at bucket $bucket")
      assert(got.toMap == fifoRef(buys, sells), s"bucket $bucket")
    }
  }

  test("hand case: one sell spans two lots; oversold tail unmatched") {
    val buys = lots(Seq((1L, 10L, 5L, 1L), (1L, 11L, 3L, 2L)))
    val sells = lots(Seq((1L, 20L, 7L, 1L), (1L, 21L, 5L, 2L)))
    val got = Inventory.fifoMatch(buys, sells, "k", "id", "q", "seq", 4L)
      .collect().map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // sell 20 takes 5 from lot 10 and 2 from lot 11; sell 21 takes the
    // remaining 1 of lot 11; 4 units oversold vanish
    assert(got == Map((10L, 20L) -> 5L, (11L, 20L) -> 2L, (11L, 21L) -> 1L))
  }

  test("non-positive quantity raises") {
    val e = intercept[Exception](Inventory.fifoMatch(
      lots(Seq((1L, 1L, 0L, 1L))), lots(Seq((1L, 2L, 1L, 1L))),
      "k", "id", "q", "seq", 4L).collect())
    assert(e.getMessage.contains("positive"))
  }

  // ── AsOf.forward ──────────────────────────────────────────────────────

  private val left = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 102L, 5L))
    .toDF("u", "lid", "t")
  private val right = Seq((1L, 200L, 10L, 7L), (1L, 201L, 30L, 8L),
    (2L, 202L, 3L, 9L)).toDF("u", "rid", "t", "v")

  test("forward picks the earliest right at time >= left, inclusive") {
    val got = AsOf.forward(left, right, Seq("u"), "t", "lid", "rid",
      Seq("rid", "v")).collect()
      .map(r => r.getLong(1) -> Option(r.getStruct(3))
        .map(s => (s.getLong(1), s.getLong(0)))).toMap
    assert(got(100L) == Some((200L, 10L)), "equal time matches (inclusive)")
    assert(got(101L) == Some((201L, 30L)))
    assert(got(102L) == None, "right strictly earlier never matches")
  }

  test("tolerance nulls matches beyond the window") {
    val got = AsOf.forward(left, right, Seq("u"), "t", "lid", "rid",
      Seq("rid", "v"), toleranceUs = Some(4L)).collect()
      .map(r => r.getLong(1) -> Option(r.getStruct(3)).map(_.getLong(1)))
      .toMap
    assert(got(100L) == Some(200L), "distance 0 inside tolerance 4")
    assert(got(101L) == None, "distance 5 outside tolerance 4")
  }

  test("equal-time right rows tie-break on the right tie column") {
    val r2 = Seq((1L, 300L, 10L, 1L), (1L, 299L, 10L, 2L))
      .toDF("u", "rid", "t", "v")
    val got = AsOf.forward(left.filter(col("lid") === 100L), r2,
      Seq("u"), "t", "lid", "rid", Seq("rid")).collect()
    assert(got.head.getStruct(3).getLong(1) == 299L)
  }

  test("reserved-name and tolerance guards") {
    intercept[IllegalArgumentException](AsOf.forward(
      left.withColumn("asof", lit(1)), right, Seq("u"), "t", "lid", "rid",
      Seq("v")))
    intercept[IllegalArgumentException](AsOf.forward(
      left, right, Seq("u"), "t", "lid", "rid", Seq("_t")))
    intercept[IllegalArgumentException](AsOf.forward(
      left, right, Seq("u"), "t", "lid", "rid", Seq("v"), Some(-1L)))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TableOps
import graft.streaming.EventStreaming
import graft.streaming.EventStreaming.Event

/** [[TableOps.prorate]] and [[EventStreaming.UpsertMaintainer]]. */
class ProrateUpsertSpec extends SparkSpec {
  import spark.implicits._

  // ── prorate ───────────────────────────────────────────────────────────

  test("hand example: equal weights, remainder to the smallest ids") {
    val rows = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L)).toDF("g", "id", "w")
    val tot = Seq((1L, 10L)).toDF("g", "t")
    val got = TableOps.prorate(rows, "g", "id", "w", tot, "t")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 4L, 2L -> 3L, 3L -> 3L))
  }

  test("property: shares sum exactly to the total and sit within 1 of exact") {
    val rnd = new scala.util.Random(195)
    val rows = for (g <- 1L to 40L; i <- 1L to (1 + rnd.nextInt(6)).toLong)
      yield (g, i, rnd.nextInt(100).toLong + (if (i == 1) 1L else 0L))
    val tots = (1L to 40L).map(g => (g, rnd.nextInt(100000).toLong))
    val got = TableOps.prorate(rows.toDF("g", "id", "w"), "g", "id", "w",
        tots.toDF("g", "t"), "t").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val totsM = tots.toMap
    val byG = rows.groupBy(_._1)
    for ((g, rs) <- byG) {
      val bigW = rs.map(_._3).sum
      if (bigW > 0) {
        assert(rs.map(r => got((g, r._2))).sum == totsM(g), s"group $g sum")
        for ((_, i, w) <- rs) {
          val exact = totsM(g).toDouble * w / bigW
          val s = got((g, i))
          assert(s >= exact.floor - 1e-9 && s <= exact.ceil + 1e-9,
            s"group $g id $i share $s vs exact $exact")
        }
      }
    }
  }

  test("all-zero weights raise; negative weight raises; missing total drops") {
    val tot = Seq((1L, 10L)).toDF("g", "t")
    val z = TableOps.prorate(Seq((1L, 1L, 0L), (1L, 2L, 0L)).toDF("g", "id", "w"),
      "g", "id", "w", tot, "t")
    assert(intercept[Exception](z.collect()).getMessage.contains("zero total weight"))
    val n = TableOps.prorate(Seq((1L, 1L, -5L)).toDF("g", "id", "w"),
      "g", "id", "w", tot, "t")
    assert(intercept[Exception](n.collect()).getMessage.contains("must be in"))
    val d = TableOps.prorate(Seq((2L, 1L, 5L)).toDF("g", "id", "w"),
      "g", "id", "w", tot, "t")
    assert(d.count() == 0L, "a row whose group has no total must drop")
  }

  test("a zero-weight row inside a positive group never takes a remainder unit") {
    // T=5, weights (0, 1): all 5 units to id 2
    val rows = Seq((1L, 1L, 0L), (1L, 2L, 1L)).toDF("g", "id", "w")
    val got = TableOps.prorate(rows, "g", "id", "w",
        Seq((1L, 5L)).toDF("g", "t"), "t")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L))
  }

  test("rejects internal-name collisions") {
    val df = Seq((1L, 1L, 1L)).toDF("__w", "id", "w")
    intercept[IllegalArgumentException](
      TableOps.prorate(df, "__w", "id", "w", df, "w"))
  }

  // ── UpsertMaintainer / upsertReplay ───────────────────────────────────

  private def mkEvents(rows: Seq[(Long, Long, Long)]) =
    rows.map { case (id, user, v) => Event(id, user, id * 1000L, v) }.toDS()

  test("delete-then-revive across batch boundaries; trailing delete removes") {
    // ids sorted: 1,2,3,10,11,20 → 3 chunks of 2: [1,2] [3,10] [11,20]
    // user 1: upsert 5 (id 1), delete (id 10), revive 7 (id 11)
    // user 2: upsert 9 (id 2), delete (id 20) → absent
    // user 3: upsert 4 (id 3) → survives untouched batches
    val evts = mkEvents(Seq((1L, 1L, 5L), (2L, 2L, 9L), (3L, 3L, 4L),
      (10L, 1L, 0L), (11L, 1L, 7L), (20L, 2L, 0L)))
    val got = EventStreaming.upsertReplay(evts, nChunks = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 3L -> 4L))
  }

  test("fold across any chunking equals one batch and equals global LWW") {
    val rnd = new scala.util.Random(196)
    val evts = (1L to 120L).map(id =>
      (id, (id % 7) + 1, rnd.nextInt(1000).toLong))
    val want = evts.groupBy(_._2).flatMap { case (u, rs) =>
      val last = rs.maxBy(_._1)
      if (last._1 % 10 == 0) None else Some(u -> last._3)
    }
    for (n <- Seq(1, 4)) {
      val got = EventStreaming.upsertReplay(mkEvents(evts), nChunks = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"nChunks=$n")
    }
  }

  test("empty slice yields an empty snapshot with the right columns") {
    val got = EventStreaming.upsertReplay(
      spark.emptyDataset[Event], nChunks = 3)
    assert(got.columns.toSeq == Seq("userId", "valueCents"))
    assert(got.count() == 0L)
  }
}

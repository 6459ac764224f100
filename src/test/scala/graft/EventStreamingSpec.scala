package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreaming
import graft.streaming.EventStreaming.Event

class EventStreamingSpec extends SparkSpec {
  import spark.implicits._

  private val evts = Seq(
    Event(0, 1, sec(0), 100), Event(1, 1, sec(300), 200),
    Event(2, 1, sec(700), 400), Event(3, 2, sec(100), 800),
    Event(4, 1, sec(5000), 1600), // far ahead: advances watermark, seals earlier state
    Event(5, 2, sec(5000), 3200))

  // day-1 offset: an event at exactly the initial watermark (epoch 0) would
  // be discarded as late; real timestamps are never at epoch 0
  private def sec(s: Long): Long = (s + 86400L) * 1000000L

  test("streaming windowed agg matches the batch run of the same pipeline") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(evts: _*) // before start: AvailableNow snapshots offsets at start
    val q = EventStreaming.windowedAgg(stream.toDS(), windowSec = 600, slideSec = 300,
        watermarkSec = 0)
      .writeStream.format("memory").queryName("winagg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(); q.stop()
    val streamed = spark.table("winagg")
      .select("userId", "win_start", "win_end", "sum_c", "cnt")
      .collect().map(_.toSeq).toSet

    // batch run of the identical pipeline (Spark unifies batch/stream APIs);
    // append-mode only emitted windows sealed by the final watermark (ts<=5000s
    // seals windows ending <= 5000s), so compare on that subset
    val batch = EventStreaming.windowedAgg(evts.toDS(), 600, 300, 0)
      .filter(col("win_end") <= timestamp_micros(lit(sec(5000))))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    assert(streamed.nonEmpty)
  }

  test("stream-static enrich joins per micro-batch, keeps unmatched events on left") {
    implicit val sqlCtx = spark.sqlContext
    // includes user 3, who has no dimension row (the unmatched case).
    // the dim key is deliberately ALSO named userId — the natural naming —
    // which the side-qualified join must not find ambiguous
    val enrichEvts = evts :+ Event(6, 3, sec(200), 50) :+ Event(7, 3, sec(400), 60)
    val stream = MemoryStream[Event]
    stream.addData(enrichEvts: _*)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("userId", "tier")
    val q = EventStreaming.enrich(stream.toDS(), dim, "userId")
      .select("eventId", "userId", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(); q.stop()
    val out = spark.table("enriched").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(out.size == enrichEvts.size, "left join must keep every event")
    out.foreach { case (_, uid, tier) =>
      val expect = uid match { case 1L => Some("gold"); case 2L => Some("basic"); case _ => None }
      assert(tier == expect, s"user $uid enriched as $tier")
    }
    // inner mode drops the unmatched
    val stream2 = MemoryStream[Event]
    stream2.addData(enrichEvts: _*)
    val q2 = EventStreaming.enrich(stream2.toDS(), dim, "userId", left = false)
      .select("userId")
      .writeStream.format("memory").queryName("enriched_inner")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.awaitTermination(); q2.stop()
    val inner = spark.table("enriched_inner").collect().map(_.getLong(0))
    assert(inner.length == evts.size && inner.forall(u => u == 1L || u == 2L),
      s"inner join must drop exactly user 3's events: ${inner.toSeq}")
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val dups = evts ++ evts.take(3).map(e => e.copy(valueCents = e.valueCents + 1))
    stream.addData(dups: _*)
    val q = EventStreaming.dedupStream(stream.toDS(), watermarkSec = 3600)
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(); q.stop()
    val out = spark.table("dedup").as[EventStreaming.Event].collect()
    assert(out.length == evts.length, s"expected ${evts.length} unique, got ${out.length}")
    assert(out.map(_.eventId).sorted.toSeq == evts.map(_.eventId).sorted)
  }

  test("stateful sessionization seals gap-delimited sessions at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    // continuous micro-batch query (not AvailableNow): the sealed sessions
    // flush in the timeout-driven no-data batch AFTER the watermark advances,
    // which needs the query loop to keep running past the last data batch
    val q = EventStreaming.sessionizeStream(stream.toDS(), gapSec = 1800, watermarkSec = 0)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    stream.addData(evts.take(4): _*)
    q.processAllAvailable()
    stream.addData(evts.drop(4): _*) // advances watermark to 5000s
    q.processAllAvailable()
    // allow the no-data timeout batch to run
    val deadline = System.currentTimeMillis() + 15000
    while (spark.table("sessions").isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(250)
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sessions").as[EventStreaming.Session].collect()
      .map(s => (s.userId, s.sessionStartUs, s.nEvents, s.sumCents)).toSet
    // sealed sessions: user 1 [0..700s] (3 events) — the 5000s events are
    // still open at the final watermark and correctly withheld
    assert(sessions.contains((1L, sec(0), 3L, 700L)), s"got $sessions")
    assert(sessions.contains((2L, sec(100), 1L, 800L)), s"got $sessions")
    assert(!sessions.exists(_._2 == sec(5000)), "open session leaked")
  }

  test("stream-stream interval join matches the batch run; state is bounded by the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq( // left: the anchor events
      Event(10, 1, sec(0), 1), Event(11, 1, sec(600), 1),
      Event(12, 2, sec(100), 1), Event(13, 1, sec(5000), 1))
    val views = Seq( // right: partners landing 0..horizon after an anchor
      Event(20, 1, sec(100), 5),  // joins click 10 (within 300s)
      Event(21, 1, sec(650), 6),  // joins click 11
      Event(22, 2, sec(600), 7),  // 500s after click 12: outside horizon
      Event(23, 1, sec(5100), 8)) // joins click 13
    val ls = MemoryStream[Event]; val rs = MemoryStream[Event]
    ls.addData(clicks: _*); rs.addData(views: _*)
    val q = EventStreaming.intervalJoin(ls.toDS(), rs.toDS(),
        horizonSec = 300, watermarkSec = 0)
      .select("l_id", "r_id")
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.awaitTermination(); q.stop()
    val streamed = spark.table("ivjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == Set((10L, 20L), (11L, 21L), (13L, 23L)), s"got $streamed")
    // unified API: the identical pipeline over bounded frames agrees
    val batch = EventStreaming.intervalJoin(clicks.toDS(), views.toDS(), 300, 0)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == streamed)
    // left-outer (batch form): unattributed anchors surface with null partner
    val outer = EventStreaming.intervalJoin(clicks.toDS(), views.toDS(), 300, 0,
        leftOuter = true)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(outer == Set((10L, 20L), (11L, 21L), (13L, 23L), (12L, -1L)), s"got $outer")
  }

  test("stream-stream LEFT OUTER join emits the unattributed anchor once the watermark seals it") {
    implicit val sqlCtx = spark.sqlContext
    val ls = MemoryStream[Event]; val rs = MemoryStream[Event]
    // continuous query (not AvailableNow): outer-side null rows flush in a
    // batch AFTER the watermark overtakes anchor_ts + horizon
    val q = EventStreaming.intervalJoin(ls.toDS(), rs.toDS(),
        horizonSec = 300, watermarkSec = 0, leftOuter = true)
      .select("l_id", "r_id")
      .writeStream.format("memory").queryName("ivouter")
      .outputMode("append").start()
    ls.addData(Event(10, 1, sec(0), 1), Event(12, 2, sec(100), 1))
    rs.addData(Event(20, 1, sec(100), 5)) // partner for 10; none for 12
    q.processAllAvailable()
    // advance BOTH watermarks (the join watermark is their min) far past
    // click 12's seal point sec(100) + 300s
    ls.addData(Event(90, 9, sec(5000), 1)); rs.addData(Event(91, 9, sec(5000), 1))
    q.processAllAvailable()
    val deadline = System.currentTimeMillis() + 15000
    def rows() = spark.table("ivouter").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    while (!rows().contains((12L, -1L)) && System.currentTimeMillis() < deadline) {
      Thread.sleep(250); q.processAllAvailable()
    }
    q.stop()
    val got = rows()
    assert(got.contains((10L, 20L)), s"matched pair missing: $got")
    assert(got.contains((12L, -1L)), s"unattributed anchor never flushed: $got")
  }

  test("sessionizeReplay seals EVERY session and matches the batch twin") {
    // unlike the poll-based seal test above, the replay harness must
    // deterministically flush all sessions — including the trailing
    // sec(5000) ones the watermark never passes in the raw stream —
    // and agree with the batch sessionize fold on the same slice
    val batch = {
      val df = evts.toDF()
        .select(col("eventId").as("event_id"), col("userId").as("user_id"),
          timestamp_micros(col("tsUs")).as("ts"),
          (col("valueCents").cast("double") / 100.0).as("value"))
      graft.events.EventOps.sessionize(df, gapSec = 1800)
        .join(evts.toDF().select(col("eventId").as("event_id"),
          col("tsUs"), col("valueCents")), Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(min("tsUs").as("s"), max("tsUs").as("e"),
          count(lit(1)).as("n"), sum("valueCents").as("v"))
        .select("user_id", "s", "e", "n", "v")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
    val replayed = EventStreaming.sessionizeReplay(evts.toDS(), gapSec = 1800)
      .map(x => (x.userId, x.sessionStartUs, x.sessionEndUs, x.nEvents, x.sumCents))
      .collect().toSet
    assert(replayed == batch, s"replay=$replayed batch=$batch")
    assert(replayed.exists(_._2 == sec(5000)),
      "trailing sessions were not sealed by the sentinel watermark")
  }

  test("native session_window agg: streaming matches batch; exact-gap successor splits") {
    implicit val sqlCtx = spark.sqlContext
    val batch = EventStreaming.sessionWindowAgg(evts.toDS(), gapSec = 1800, watermarkSec = 0)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val stream = MemoryStream[Event]
    val q = EventStreaming.sessionWindowAgg(stream.toDS(), gapSec = 1800, watermarkSec = 0)
      .writeStream.format("memory").queryName("swagg").outputMode("append").start()
    // sentinel pattern (same as sessionizeReplay): batch 2 advances the
    // watermark past every real session's end+gap, batch 3 runs WITH it
    stream.addData(evts: _*)
    q.processAllAvailable()
    stream.addData(Event(-1, 99, sec(100000), 0))
    q.processAllAvailable()
    stream.addData(Event(-2, 99, sec(100001), 0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("swagg").as[(Long, Long, Long, Long, Long)]
      .collect().filter(_._1 != 99L).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // boundary semantics: adjacent [ts, ts+gap) ranges MERGE (Spark's
    // session merge is start <= currentEnd), so an exactly-gap successor
    // stays in the session — splits need diff > gap, exactly like
    // EventOps.sessionize. One microsecond past the gap splits.
    val edge = Seq(Event(0, 1, sec(0), 1), Event(1, 1, sec(1800), 2)).toDS()
    assert(EventStreaming.sessionWindowAgg(edge, 1800, 0).count() == 1,
      "exactly-gap successor must merge into the session")
    val past = Seq(Event(0, 1, sec(0), 1), Event(1, 1, sec(1800) + 1L, 2)).toDS()
    assert(EventStreaming.sessionWindowAgg(past, 1800, 0).count() == 2,
      "one microsecond past the gap must start a new session")
  }

  test("sessionizeStream handles a 5000-event continuous session (compact state)") {
    // the always-active-key stress: one user, events every 60s for 5000
    // events — a single never-gapping session. State must stay a single
    // (start, end, n, sum) record, and the session must seal correctly
    // once the sentinel watermark passes
    val many = (0 until 5000).map(i => Event(i.toLong, 7L, sec(i.toLong * 60), 1L))
    val out = EventStreaming.sessionizeReplay(many.toDS(), gapSec = 1800).collect()
    assert(out.length == 1, s"expected one merged session, got ${out.length}")
    val s = out.head
    assert((s.userId, s.sessionStartUs, s.sessionEndUs, s.nEvents, s.sumCents) ==
      ((7L, sec(0), sec(4999L * 60), 5000L, 5000L)), s"got $s")
  }

  test("dedupReplay keeps exactly one copy of each duplicated id") {
    val dupd = (evts ++ evts ++ evts).toDS()
    val out = EventStreaming.dedupReplay(dupd, watermarkSec = 3600).collect()
    assert(out.length == evts.length)
    assert(out.sortBy(_.eventId).toSeq == evts.sortBy(_.eventId))
  }

  test("sketchReplay: fold across ANY chunking equals the one-batch sketch") {
    // richer corpus: 40 events over 3 users, values spanning the domain
    // plus one overflow (>= hi) landing in the overflow slot
    val rnd = new scala.util.Random(9L)
    val rows = (0L until 40L).map(i =>
      Event(i, i % 3 + 1, sec(i * 10), rnd.nextInt(1000).toLong)) :+
      Event(99L, 1L, sec(9999), 5000L) // overflow vs hi = 1000
    val ds = rows.toDS()
    val snaps = Seq(1, 4, 7).map { k =>
      EventStreaming.sketchReplay(ds, nChunks = k, lo = 0L, hi = 1000L, bins = 10)
        .as[(Long, Seq[Long])].collect().toSeq
    }
    // chunking-independent (the exact monoid fold)…
    assert(snaps(0) == snaps(1) && snaps(1) == snaps(2))
    // …and equal to the direct batch sketch of the whole slice
    val batch = graft.operators.QuantileSketch.sketch(
        ds.toDF(), Seq("userId"), "valueCents", 0L, 1000L, 10)
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    assert(snaps(0) == batch)
    // the overflow event is in user 1's overflow slot
    val u1 = batch.find(_._1 == 1L).get._2
    assert(u1.last == 1L)
    // totals conserve the event count
    assert(batch.map(_._2.sum).sum == rows.size.toLong)
    // empty slice: empty snapshot with the sketch schema
    val empty = EventStreaming.sketchReplay(
      spark.emptyDataset[Event], nChunks = 3, lo = 0L, hi = 1000L, bins = 10)
    assert(empty.columns.toSeq == Seq("userId", "sketch") && empty.count() == 0)
  }

  test("bucketed sketch maintainer: any buckets x any chunking == the one-batch sketch; sparse batches touch few slices") {
    val rnd = new scala.util.Random(21L)
    // 60 events over 12 users: key space wide enough that 8 buckets
    // actually split it
    val rows = (0L until 60L).map(i =>
      Event(i, rnd.nextInt(12).toLong + 1L, sec(i * 10),
        rnd.nextInt(1000).toLong))
    val ds = rows.toDS()
    val batch = graft.operators.QuantileSketch.sketch(
        ds.toDF(), Seq("userId"), "valueCents", 0L, 1000L, 10)
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    for (b <- Seq(0, 1, 3, 8); k <- Seq(1, 5, 12)) {
      // k = 12 > the store's default maxPending, so compaction boundaries
      // (pending fold + touched-slice merge) are crossed mid-replay
      val snap = EventStreaming.sketchReplay(ds, nChunks = k,
          lo = 0L, hi = 1000L, bins = 10, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"buckets=$b nChunks=$k")
    }
    // SPARSE batch contract: a batch whose keys all hash to one slice
    // must leave every other slice untouched (same frame object)
    val m = new EventStreaming.SketchStateMaintainer("userId", "valueCents",
      0L, 1000L, 10, buckets = 64)
    m.absorb(Seq((1L, 10L)).toDF("userId", "valueCents"))
    m.absorb(Seq((2L, 20L)).toDF("userId", "valueCents"))
    val before = m.current.get.orderBy("userId")
      .as[(Long, Seq[Long])].collect().toSeq
    // absorbing user 1 again must not rewrite user 2's slice: the
    // snapshot stays correct AND user-2 rows carry the same counts
    m.absorb(Seq((1L, 30L)).toDF("userId", "valueCents"))
    val after = m.current.get.orderBy("userId")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(after.find(_._1 == 2L) == before.find(_._1 == 2L))
    assert(after.find(_._1 == 1L).get._2.sum == 2L)
    // empty first batch leaves a schema-correct empty snapshot
    val m2 = new EventStreaming.SketchStateMaintainer("userId", "valueCents",
      0L, 1000L, 10, buckets = 8)
    m2.absorb(spark.emptyDataset[Event].toDF()
      .select(col("userId"), col("valueCents")))
    assert(m2.current.get.count() == 0)
    intercept[IllegalArgumentException](new EventStreaming.SketchStateMaintainer(
      "userId", "valueCents", 0L, 1000L, 10, buckets = -1))
  }

  test("distinctReplay: any chunking == the batch registers; duplicate re-delivery is absorbed") {
    // 50 events over 4 users across 9 distinct days
    val rows = (0L until 50L).map(i =>
      Event(i, i % 4 + 1, (i % 9) * 86400000000L + sec(i), i))
    val ds = rows.toDS()
    val batch = graft.operators.DistinctSketch.sketch(
        ds.toDF().withColumn("day", expr("tsUs div 86400000000")),
        Seq("userId"), "day")
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    for (k <- Seq(1, 3, 7); b <- Seq(1, 8)) {
      val snap = EventStreaming.distinctReplay(ds, nChunks = k, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"nChunks=$k buckets=$b")
    }
    // at-least-once: replaying the whole slice TWICE (every value
    // re-delivered) leaves the registers unchanged — max is idempotent
    val dup = EventStreaming.distinctReplay((rows ++ rows).toDS(), nChunks = 4)
      .as[(Long, Seq[Long])].collect().toSeq
    assert(dup == batch)
    // empty slice: empty snapshot with the sketch schema
    val empty = EventStreaming.distinctReplay(
      spark.emptyDataset[Event], nChunks = 2)
    assert(empty.columns.toSeq == Seq("userId", "sketch") && empty.count() == 0)
  }

  test("csReplay: any chunking x bucketing == the batch counters; re-delivery COUNTS") {
    val rows = (0L until 60L).map(i =>
      Event(i, i % 4 + 1, sec(i), i % 13 * 100L))
    val ds = rows.toDS()
    val batch = graft.operators.CountSketch.sketch(
        ds.toDF(), Seq("userId"), "valueCents")
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    for (k <- Seq(1, 3, 7); b <- Seq(1, 8)) {
      val snap = EventStreaming.csReplay(ds, nChunks = k, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"nChunks=$k buckets=$b")
    }
    // signed counters: replaying the slice twice doubles every counter
    // (the non-idempotent line, same as the CMS maintainer)
    val dup = EventStreaming.csReplay((rows ++ rows).toDS(), nChunks = 4)
      .as[(Long, Seq[Long])].collect().toSeq
    assert(dup == batch.map { case (u, sk) => (u, sk.map(_ * 2L)) })
    val empty = EventStreaming.csReplay(spark.emptyDataset[Event], nChunks = 2)
    assert(empty.columns.toSeq == Seq("userId", "sketch") && empty.count() == 0)
  }

  test("kmvReplay: any chunking == the batch registers; duplicate re-delivery is absorbed") {
    // 50 events over 7 users across 5 distinct days
    val rows = (0L until 50L).map(i =>
      Event(i, i % 7 + 1, (i % 5) * 86400000000L + sec(i), i))
    val ds = rows.toDS()
    val batch = graft.operators.KmvSketch.sketch(
        ds.toDF().withColumn("day", expr("tsUs div 86400000000")),
        Seq("day"), "userId")
      .orderBy("day").as[(Long, Seq[Long])].collect().toSeq
    for (k <- Seq(1, 3, 7); b <- Seq(1, 8)) {
      val snap = EventStreaming.kmvReplay(ds, nChunks = k, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"nChunks=$k buckets=$b")
    }
    // at-least-once: replaying the whole slice TWICE (every value
    // re-delivered) leaves the registers unchanged — min is idempotent
    val dup = EventStreaming.kmvReplay((rows ++ rows).toDS(), nChunks = 4)
      .as[(Long, Seq[Long])].collect().toSeq
    assert(dup == batch)
    // empty slice: empty snapshot with the sketch schema
    val empty = EventStreaming.kmvReplay(
      spark.emptyDataset[Event], nChunks = 2)
    assert(empty.columns.toSeq == Seq("day", "kmv") && empty.count() == 0)
  }

  test("bloomReplay: any chunking == the batch words; duplicate re-delivery is absorbed") {
    // 50 events over 7 users across 5 distinct days
    val rows = (0L until 50L).map(i =>
      Event(i, i % 7 + 1, (i % 5) * 86400000000L + sec(i), i))
    val ds = rows.toDS()
    val batch = graft.operators.BloomSketch.sketch(
        ds.toDF().withColumn("day", expr("tsUs div 86400000000")),
        Seq("userId"), "day", numWords = 8, k = 4)
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    for (k <- Seq(1, 3, 7); b <- Seq(1, 8)) {
      val snap = EventStreaming.bloomReplay(ds, nChunks = k, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"nChunks=$k buckets=$b")
    }
    // at-least-once: replaying the whole slice TWICE (every value
    // re-delivered) leaves the words unchanged — OR is idempotent
    val dup = EventStreaming.bloomReplay((rows ++ rows).toDS(), nChunks = 4)
      .as[(Long, Seq[Long])].collect().toSeq
    assert(dup == batch)
    // empty slice: empty snapshot with the sketch schema
    val empty = EventStreaming.bloomReplay(
      spark.emptyDataset[Event], nChunks = 2)
    assert(empty.columns.toSeq == Seq("userId", "bloom") && empty.count() == 0)
  }

  test("cmsReplay: any chunking x bucketing == the batch counters; re-delivery COUNTS (non-idempotent)") {
    val rows = (0L until 60L).map(i =>
      Event(i, i % 4 + 1, sec(i), i % 13 * 100L))
    val ds = rows.toDS()
    val batch = graft.operators.CountMinSketch.sketch(
        ds.toDF(), Seq("userId"), "valueCents")
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    for (k <- Seq(1, 3, 7); b <- Seq(1, 8)) {
      val snap = EventStreaming.cmsReplay(ds, nChunks = k, buckets = b)
        .as[(Long, Seq[Long])].collect().toSeq
      assert(snap == batch, s"nChunks=$k buckets=$b")
    }
    // the line vs the distinct maintainer: replaying the slice twice
    // DOUBLES every counter — frequency sketches need exactly-once (or
    // upstream dedup); the spec pins the failure mode, not just the
    // happy path
    val dup = EventStreaming.cmsReplay((rows ++ rows).toDS(), nChunks = 4)
      .as[(Long, Seq[Long])].collect().toSeq
    assert(dup == batch.map { case (u, sk) => (u, sk.map(_ * 2L)) })
    // empty slice: empty snapshot with the sketch schema
    val empty = EventStreaming.cmsReplay(spark.emptyDataset[Event], nChunks = 2)
    assert(empty.columns.toSeq == Seq("userId", "sketch") && empty.count() == 0)
  }

  test("ccReplay: any chunking == one-shot CC; re-delivered edges absorbed") {
    import EventStreaming.GraphEdge
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(60)(
      GraphEdge(rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e.docA != e.docB)
    val nodes = edges.flatMap(e => Seq(e.docA, e.docB)).distinct
    val oneShot = graft.text.Dedup.clustersStars(
        nodes.toDF("doc_id"), edges.map(e => (e.docA, e.docB)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- Seq(1, 3, 7)) {
      val snap = EventStreaming.ccReplay(edges.toDS(), nChunks = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(snap == oneShot, s"nChunks=$k")
    }
    // CC is idempotent in its edge multiset: full re-delivery is a no-op
    val dup = EventStreaming.ccReplay((edges ++ edges).toDS(), nChunks = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == oneShot)
    // empty stream: schema-correct empty snapshot
    val empty = EventStreaming.ccReplay(spark.emptyDataset[GraphEdge], nChunks = 2)
    assert(empty.columns.toSeq == Seq("doc_id", "cluster") && empty.count() == 0)
  }

  test("cc maintainer: deferred relabels equal one-shot CC at EVERY read point, across compactions") {
    import EventStreaming.GraphEdge
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(80)(
      GraphEdge(rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e.docA != e.docB)
    // maxPending = 2: reads land before, at, and after compaction
    // boundaries, so the composed-map path AND the compacted path are
    // both checked against the one-shot CC of the prefix
    val m = new EventStreaming.CcStateMaintainer(maxPending = 2)
    val seen = scala.collection.mutable.ArrayBuffer.empty[GraphEdge]
    edges.grouped(10).foreach { chunk =>
      seen ++= chunk
      m.absorb(chunk.map(e => (e.docA, e.docB)).toDF("doc_a", "doc_b"))
      val got = m.current.get.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = seen.flatMap(e => Seq(e.docA, e.docB)).distinct
      val want = graft.text.Dedup.clustersStars(nodes.toSeq.toDF("doc_id"),
          seen.map(e => (e.docA, e.docB)).toSeq.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"diverged after ${seen.size} edges")
    }
  }

  test("bucketed agg-state maintainer: any buckets x any chunking == the direct aggState; sparse batches touch few slices") {
    val rows = (0L until 48L).map(i =>
      Event(i, i % 6 + 1, sec(i), i * 3 % 101))
    def snapOf(m: EventStreaming.AggStateMaintainer): Seq[org.apache.spark.sql.Row] =
      m.current.get.orderBy("userId").collect().toSeq
    val direct = {
      val m = new EventStreaming.AggStateMaintainer("userId", "valueCents")
      m.absorb(rows.toDF())
      snapOf(m)
    }
    for (b <- Seq(0, 1, 4, 16); k <- Seq(2, 5, 11)) {
      val m = new EventStreaming.AggStateMaintainer("userId", "valueCents", b)
      rows.grouped(math.max(1, rows.size / k)).foreach(c => m.absorb(c.toDF()))
      assert(snapOf(m) == direct, s"buckets=$b chunks=$k")
    }
    // sparse contract: re-absorbing user 1 must not rewrite user 2's slice
    val m = new EventStreaming.AggStateMaintainer("userId", "valueCents", 64)
    m.absorb(Seq((1L, 10L)).toDF("userId", "valueCents"))
    m.absorb(Seq((2L, 20L)).toDF("userId", "valueCents"))
    val before = snapOf(m)
    m.absorb(Seq((1L, 30L)).toDF("userId", "valueCents"))
    val after = snapOf(m)
    assert(after.find(_.getLong(0) == 2L) == before.find(_.getLong(0) == 2L))
    intercept[IllegalArgumentException](
      new EventStreaming.AggStateMaintainer("userId", "valueCents", -1))
  }

  test("segmented store: absorb is O(batch) — no snapshot read per batch; compaction folds exactly") {
    // count the jobs each absorb runs: with the segmented store an
    // absorb below the compaction threshold must not scan the snapshot
    // (one checkpoint job for the batch's own state, nothing keyed on
    // the accumulated key count)
    val m = new EventStreaming.SketchStateMaintainer("userId", "valueCents",
      0L, 1000L, 10, buckets = 0)
    val sc = spark.sparkContext
    def jobsRun[A](body: => A): Int = {
      val before = sc.statusTracker.getJobIdsForGroup(null).length
      body
      sc.statusTracker.getJobIdsForGroup(null).length - before
    }
    m.absorb(Seq((1L, 10L)).toDF("userId", "valueCents"))
    val costSmall = jobsRun(
      m.absorb(Seq((2L, 20L)).toDF("userId", "valueCents")))
    // grow the key space; a per-batch snapshot join would add jobs/scans
    m.absorb((1L to 500L).map(i => (i, i)).toDF("userId", "valueCents"))
    val costAfterGrowth = jobsRun(
      m.absorb(Seq((3L, 30L)).toDF("userId", "valueCents")))
    assert(costAfterGrowth <= costSmall,
      s"absorb cost grew with key count: $costSmall -> $costAfterGrowth jobs")
    // the snapshot is still exact across pending segments
    val snap = m.current.get.orderBy("userId").as[(Long, Seq[Long])]
      .collect().toSeq
    val direct = graft.operators.QuantileSketch.sketch(
        ((1L to 500L).map(i => (i, i)) ++ Seq((1L, 10L), (2L, 20L), (3L, 30L)))
          .toDF("userId", "valueCents"),
        Seq("userId"), "valueCents", 0L, 1000L, 10)
      .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
    assert(snap == direct)

    // compaction (maxPending crossings) preserves exactness at every
    // read point, including reads BETWEEN compactions — drive 20 batches
    // through an auto store and check the snapshot after each
    val m2 = new EventStreaming.SketchStateMaintainer("userId", "valueCents",
      0L, 1000L, 10, buckets = 0)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    (1 to 20).foreach { i =>
      val batch = Seq(((i % 7 + 1).toLong, (i * 13 % 1000).toLong))
      seen ++= batch
      m2.absorb(batch.toDF("userId", "valueCents"))
      if (i % 5 == 0) {
        val got = m2.current.get.orderBy("userId").as[(Long, Seq[Long])]
          .collect().toSeq
        val want = graft.operators.QuantileSketch.sketch(
            seen.toSeq.toDF("userId", "valueCents"),
            Seq("userId"), "valueCents", 0L, 1000L, 10)
          .orderBy("userId").as[(Long, Seq[Long])].collect().toSeq
        assert(got == want, s"snapshot diverged at batch $i")
      }
    }
  }
}

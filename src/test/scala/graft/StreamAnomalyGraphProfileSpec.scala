package graft

import org.apache.spark.sql.functions._

import graft.graph.GraphProfile
import graft.streaming.EventStreaming
import graft.streaming.EventStreaming.Event

/** [[EventStreaming.AnomalyMaintainer]]/anomalyReplay and
  * [[GraphProfile.profile]]. */
class StreamAnomalyGraphProfileSpec extends SparkSpec {
  import spark.implicits._

  private val dayUs = 86400000000L

  // ── streaming anomaly maintenance ─────────────────────────────────────

  test("fold across any batch split equals the batch window math") {
    val rnd = new scala.util.Random(67)
    val evts = for (u <- 1L to 12L; d <- 0L until 15L) yield
      Event(u * 100 + d, u, d * dayUs + rnd.nextInt(1000000),
        if (d == 9L && u % 3 == 0) 50000L else rnd.nextInt(300).toLong)
    val ds = evts.toDS()
    val batch = {
      val daily = ds.toDF()
        .select(col("userId"),
          expr(s"(tsUs - pmod(tsUs, ${dayUs}L)) div ${dayUs}L").as("bucket"),
          col("valueCents"))
        .groupBy("userId", "bucket").agg(sum("valueCents").as("x_c"))
      graft.events.EventOps
        .rollingAnomalyFromDaily(daily, "userId", 5, 25)
        .collect().map(_.toSeq).toSeq
    }
    for (chunks <- Seq(1, 3, 7)) {
      val got = EventStreaming.anomalyReplay(ds, chunks, window = 5,
        zTimes10 = 25).orderBy("userId", "bucket").collect().map(_.toSeq).toSeq
      assert(got == batch, s"nChunks=$chunks diverged from batch")
    }
    // the planted day-9 spikes for every third user are flagged
    val flags = EventStreaming.anomalyReplay(ds, 3, window = 5, zTimes10 = 25)
      .filter(col("is_anomaly") === 1L).select("userId", "bucket")
      .as[(Long, Long)].collect().toSet
    assert((1L to 12L).filter(_ % 3 == 0).map(u => (u, 9L)).toSet
      .subsetOf(flags))
  }

  test("maintainer plan and state stay bounded across 20 batches") {
    val m = new EventStreaming.AnomalyMaintainer()
    for (b <- 1 to 20) {
      val batch = Seq(Event(b.toLong, b.toLong % 4, b.toLong * dayUs, 10L))
        .toDF()
      m.absorb(batch)
    }
    val snap = m.current.get
    val planLines = snap.queryExecution.optimizedPlan.toString
      .linesIterator.size
    assert(planLines <= 10,
      s"snapshot plan grew with batch count: $planLines lines")
    assert(snap.count() == 20L)
    assert(m.flags.count() == 20L)
  }

  test("flags before any batch raises; empty slice yields empty flags") {
    val m = new EventStreaming.AnomalyMaintainer()
    intercept[IllegalStateException](m.flags)
    val empty = EventStreaming.anomalyReplay(
      spark.emptyDataset[Event], nChunks = 2)
    assert(empty.count() == 0L)
  }

  // ── graph profile ─────────────────────────────────────────────────────

  test("star graph profile: counts, degrees, density are exact") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (1L, 0L))
      .toDF("a", "b") // one reversed dup collapses
    val got = GraphProfile.profile(edges, "a", "b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // n=5, m=4, degrees {4,1,1,1,1}: min 1, lower median 1, max 4
    assert(got == ((5L, 4L, 1L, 1L, 4L, 8L, 20L)))
  }

  test("property: median matches the sorted-degree definition") {
    val rnd = new scala.util.Random(71)
    val raw = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val canon = raw.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val degs = (canon.map(_._1) ++ canon.map(_._2))
      .groupBy(identity).map(_._2.size.toLong).toSeq.sorted
    val got = GraphProfile.profile(raw.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(got._1 == degs.size.toLong && got._2 == canon.size.toLong)
    assert(got._3 == degs.head && got._5 == degs.last)
    assert(got._4 == degs((((degs.size + 1) / 2) - 1)))
    assert(got._6 == 2L * canon.size && got._7 == degs.size.toLong * (degs.size - 1L))
  }

  test("empty graph yields an empty frame with the full schema") {
    val empty = GraphProfile.profile(
      Seq((1L, 1L)).toDF("a", "b"), "a", "b") // only a self-loop
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("n_nodes", "n_edges", "min_deg",
      "med_deg", "max_deg", "density_num", "density_den"))
  }
}

package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TableOps
import graft.streaming.EventStreaming
import graft.streaming.EventStreaming.Event

class StreamingAggStateSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private def evts(n: Int, seed: Int): Seq[Event] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => Event(i.toLong, rnd.nextInt(15).toLong,
      1000000L * i, rnd.nextInt(500).toLong))
  }

  test("replay across any batch split equals the direct aggregate") {
    val rows = evts(300, 1)
    val direct = TableOps.aggState(rows.toDS().toDF(), "userId", "valueCents")
    for (chunks <- Seq(1, 3, 7)) {
      val got = EventStreaming.aggStateReplay(rows.toDS(), chunks)
      assert(canon(got) == canon(direct), s"nChunks=$chunks")
    }
  }

  test("snapshot plan stays bounded across many absorbed batches") {
    // the segmented store defers up to maxPending merges to the read, so
    // the snapshot plan is NOT one leaf deep — the invariant is that its
    // size is a CONSTANT of (maxPending, shard count), independent of how
    // many batches were ever absorbed: without compaction's lineage
    // truncation the plan would grow by a join per batch
    def planNodes(nBatches: Int, seed: Int): Int = {
      val m = new EventStreaming.AggStateMaintainer("userId", "valueCents")
      evts(20 * nBatches, seed).grouped(20)
        .foreach(chunk => m.absorb(chunk.toDS().toDF()))
      m.current.get.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    val at20 = planNodes(20, 2)
    val at60 = planNodes(60, 3)
    assert(at60 <= at20 + 8, // one extra base shard at most, never per-batch
      s"snapshot plan grew with batch count: $at20 nodes at 20 batches, " +
        s"$at60 at 60 — lineage is not being truncated")
    val m = new EventStreaming.AggStateMaintainer("userId", "valueCents")
    val rows = evts(400, 2)
    rows.grouped(20).foreach(chunk => m.absorb(chunk.toDS().toDF()))
    assert(canon(m.current.get) ==
      canon(TableOps.aggState(rows.toDS().toDF(), "userId", "valueCents")))
  }

  test("empty stream yields the empty state frame with the right schema") {
    val got = EventStreaming.aggStateReplay(spark.emptyDataset[Event], 3)
    assert(got.columns.toSeq == Seq("userId", "n", "sum_x", "min_x", "max_x"))
    assert(got.count() == 0)
  }
}

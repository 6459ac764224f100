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
    val m = new EventStreaming.AggStateMaintainer("userId", "valueCents")
    val rows = evts(400, 2)
    rows.grouped(20).foreach(chunk => m.absorb(chunk.toDS().toDF()))
    val snap = m.current.get
    // 20 merges would nest 20 full-outer joins without the per-batch
    // lineage truncation; with it, the current snapshot is one leaf deep
    val planNodes = snap.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes <= 10,
      s"snapshot plan has $planNodes nodes — lineage is not being truncated")
    assert(canon(snap) ==
      canon(TableOps.aggState(rows.toDS().toDF(), "userId", "valueCents")))
  }

  test("empty stream yields the empty state frame with the right schema") {
    val got = EventStreaming.aggStateReplay(spark.emptyDataset[Event], 3)
    assert(got.columns.toSeq == Seq("userId", "n", "sum_x", "min_x", "max_x"))
    assert(got.count() == 0)
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

import graft.operators.TableOps

/** The wide-table profile path must (a) equal the explode path
  * cell-for-cell and (b) never put #cols × rows records through a single
  * stage's shuffle — the bound that makes it the 100-TB shape for wide
  * tables. */
class ProfileBatchedSpec extends SparkSpec {
  import spark.implicits._

  test("profileBatched ≡ profile on a mixed-type frame with nulls") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(1.5)),
      (2L, Some("b"), None),
      (3L, Some("a"), Some(2.0)))
      .toDF("k", "s", "x")
    val a = TableOps.profile(df, Seq("k", "s", "x")).collect().toSeq
    val b = TableOps.profileBatched(df, Seq("k", "s", "x")).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    // and the values themselves are right
    val m = b.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m == Map("k" -> ((4L, 0L, 3L)), "s" -> ((4L, 1L, 2L)),
      "x" -> ((4L, 1L, 2L))))
  }

  test("profileBatched on an empty frame reports zero rows, not null sums") {
    val df = Seq((1L, "a")).toDF("k", "s").filter(col("k") < 0)
    val out = TableOps.profileBatched(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map("k" -> ((0L, 0L, 0L)), "s" -> ((0L, 0L, 0L))))
  }

  test("profileBatched rejects unknown and empty column lists") {
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException](TableOps.profileBatched(df, Seq.empty))
    intercept[IllegalArgumentException](TableOps.profileBatched(df, Seq("nope")))
  }

  test("wide probe: batched peak per-stage shuffle is O(rows), explode's is #cols × rows") {
    val n = 20000L
    val nCols = 50
    // every cell distinct → per-column distinct = n, the worst case for
    // both paths' exchanges
    val wide = spark.range(n).select(
      (0 until nCols).map(i => (col("id") * nCols + i).as(s"c$i")): _*)
    val cols = (0 until nCols).map(i => s"c$i")

    val maxShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null)
          maxShuffle.getAndAccumulate(m.shuffleWriteMetrics.recordsWritten, math.max)
      }
    }
    // stage-completion events are delivered async; poll until the max is
    // stable rather than reaching into private[spark] listener-bus APIs
    def settle(): Long = {
      var last = -1L
      var cur = maxShuffle.get
      var spins = 0
      while (cur != last && spins < 40) {
        last = cur; Thread.sleep(250); cur = maxShuffle.get; spins += 1
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      maxShuffle.set(0L)
      TableOps.profileBatched(wide, cols).collect()
      val batchedMax = settle()
      maxShuffle.set(0L)
      TableOps.profile(wide, cols).collect()
      val explodeMax = settle()
      // explode: one stage's partial agg shuffles every distinct
      // (col_name, value) pair = #cols × rows. batched: the widest stage
      // is one column's distinct set = rows.
      assert(explodeMax >= n * nCols * 9 / 10,
        s"expected the explode path to shuffle ~#cols×rows in one stage, saw $explodeMax")
      assert(batchedMax <= n * 2,
        s"batched path put $batchedMax records through one stage's shuffle (rows=$n)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

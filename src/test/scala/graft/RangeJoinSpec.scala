package graft

import org.apache.spark.sql.functions._

import graft.events.RangeJoin

/** The bucketed range join must equal the naive theta join (which Spark
  * plans as BroadcastNestedLoopJoin) while itself planning as an
  * equi-join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(41L)

  test("matches the naive theta join, negatives and bucket edges included") {
    // points straddling zero and landing exactly on bucket boundaries
    val pts = (Seq(-300L, -100L, 0L, 100L, 299L, 300L, 301L) ++
      Seq.fill(200)(rng.nextInt(4000).toLong - 2000L)).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("p_id", "t")
    val ivs = (Seq((-300L, 0L), (0L, 300L), (300L, 300L), (-50L, 49L)) ++
      Seq.fill(40) { val s = rng.nextInt(4000).toLong - 2000L; (s, s + rng.nextInt(700).toLong) })
      .zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }.toDF("iv_id", "s", "e")
    val expect = pts.join(ivs, col("s") <= col("t") && col("t") <= col("e"))
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    for (width <- Seq(1L, 7L, 300L, 10000L)) {
      val got = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", width)
        .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == expect.toSeq, s"bucketWidth=$width")
    }
  }

  test("plans as an equi-join on the bucket, never a nested-loop join") {
    val pts = Seq((1L, 10L)).toDF("p_id", "t")
    val ivs = Seq((1L, 0L, 20L)).toDF("iv_id", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key missing from the plan:\n$plan")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.events.RangeJoin

/** The bucketed interval-overlap join must equal the naive theta join
  * EXACTLY ONCE per pair (the first-shared-bucket keep rule replaces a
  * distinct pass), while planning as an equi-join. */
class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(43L)

  test("matches the naive theta join with no duplicate pairs, all widths") {
    val left = (Seq((-300L, 0L), (0L, 300L), (300L, 300L), (-50L, 49L)) ++
      Seq.fill(120) { val s = rng.nextInt(4000).toLong - 2000L; (s, s + rng.nextInt(900).toLong) })
      .zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("a_id", "a_s", "a_e")
    val right = (Seq((0L, 0L), (-1L, 1L), (299L, 301L)) ++
      Seq.fill(80) { val s = rng.nextInt(4000).toLong - 2000L; (s, s + rng.nextInt(400).toLong) })
      .zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("b_id", "b_s", "b_e")
    val expect = left.join(right, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for (width <- Seq(1L, 7L, 300L, 10000L)) {
      // sorted MULTISET comparison: a pair emitted twice would show up here
      val got = RangeJoin.intervalOverlap(left, "a_s", "a_e", right, "b_s", "b_e", width)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(got == expect, s"bucketWidth=$width")
    }
  }

  test("plans as an equi-join on the bucket, never a nested loop") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((1L, 5L, 20L)).toDF("b_id", "b_s", "b_e")
    val plan = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n$plan")
    assert(plan.contains(RangeJoin.bucketCol), s"bucket key missing:\n$plan")
  }

  test("a pair sharing many buckets is still emitted once") {
    // both intervals span buckets 0..99 at width 10
    val a = Seq((1L, 0L, 999L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((9L, 5L, 995L)).toDF("b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 10L)
      .select("a_id", "b_id").collect().toSeq
    assert(got.size == 1)
  }

  test("guards the per-interval explode bound on either side") {
    val a = Seq((1L, 0L, 1000000L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((1L, 0L, 1L)).toDF("b_id", "b_s", "b_e")
    val ex = intercept[Exception] {
      RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 1L,
        maxBucketsPerInterval = 100L).collect()
    }
    assert(ex.getMessage != null)
  }
}

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
    assert(plan.contains(RangeJoin.bucketCol), s"bucket key missing from the plan:\n$plan")
  }

  test("bucketing is exact integer floor-division beyond 2^53") {
    // at 2^53 + k a double can't represent every long: the old double-cast
    // bucketOf would collapse adjacent values into the wrong bucket edge
    val base = (1L << 53) + 10L
    val pts = Seq((1L, base), (2L, -base)).toDF("p_id", "t")
    val ivs = Seq((1L, base - 2L, base + 2L), (2L, -base - 2L, -base + 2L))
      .toDF("iv_id", "s", "e")
    val got = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 7L)
      .select("p_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L)))
  }

  test("rejects inputs already carrying the internal bucket column") {
    val pts = Seq((1L, 10L)).toDF("p_id", RangeJoin.bucketCol)
    val ivs = Seq((1L, 0L, 20L)).toDF("iv_id", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(pts, RangeJoin.bucketCol, ivs, "s", "e", 16L)
    }
  }

  test("an interval spanning more than maxBucketsPerInterval fails loudly, not with OOM") {
    val pts = Seq((1L, 10L)).toDF("p_id", "t")
    val ivs = Seq((1L, 0L, 10000000L)).toDF("iv_id", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 1L, maxBucketsPerInterval = 1000L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucketsPerInterval")), e.toString)
  }

  test("an INVERTED interval (end < start) fails loudly instead of exploding or vanishing") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    val pts = Seq((1L, 10L)).toDF("p_id", "t")
    // end far below start: the negative bucket delta used to pass the
    // span guard and hand sequence() a descending range
    val ivs = Seq((1L, 1000000L, 0L)).toDF("iv_id", "s", "e")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 100L).collect()
    }
    assert(messages(e1).exists(_.contains("inverted")), e1.toString)
    val l = Seq((1L, 5L, 20L)).toDF("l_id", "ls", "le")
    val r = Seq((1L, 900L, 2L)).toDF("r_id", "rs", "re")
    val e2 = intercept[Exception] {
      RangeJoin.intervalOverlap(l, "ls", "le", r, "rs", "re", 10L).collect()
    }
    assert(messages(e2).exists(_.contains("inverted")), e2.toString)
  }
}

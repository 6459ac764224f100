package graft

import org.apache.spark.sql.functions._

import graft.operators.{CountMinSketch, CountSketch}

/** The AMS / count-sketch contracts: signed counters match an
  * independent driver-side md5 reference, the state monoid is exact
  * (merge/rollup == direct, duplicates ADD), and the UNBIASED reads —
  * point frequency, F2, join size — land near planted truths where the
  * CMS reads can only bound them. The state AND the integer reads are
  * oracle-gated (q245–q247); accuracy is pinned here. */
class CountSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 5
  private val W = 128

  /** Independent reference: md5 via MessageDigest, same slice layout —
    * row-i slot = i·W + (16-bit slice at 4i mod W), sign = parity of
    * hex char index 21+i (0-based), counter = Σ sign. */
  private def refCounters(values: Seq[String]): Map[Int, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.flatMap { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until D).map { i =>
        val slot = i * W + Integer.parseInt(hex.slice(4 * i, 4 * i + 4), 16) % W
        val sgn = 1L - 2L * (Integer.parseInt(hex.charAt(21 + i).toString, 16) % 2)
        (slot, sgn)
      }
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      .filter(_._2 != 0L)
  }

  private def gotCounters(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    CountSketch.registers(df, Nil, "v", D, W)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap

  test("signed counters match the driver-side md5 reference (strings and longs)") {
    val strs = (1 to 500).map(i => s"doc-${i % 173}") // duplicates ADD
    assert(gotCounters(strs.toDF("v")) == refCounters(strs))
    val longs = (1L to 300L).map(i => (i % 91L) * 7919L)
    assert(gotCounters(longs.toDF("v")) == refCounters(longs.map(_.toString)))
  }

  test("state monoid: sketch(A ⊎ B) == merge; duplicates DOUBLE (non-idempotent)") {
    val a = (1 to 400).map(i => ("g", s"u${i % 97}"))
    val b = (1 to 300).map(i => ("g", s"w${i % 53}"))
    def sk(xs: Seq[(String, String)]) =
      CountSketch.sketch(xs.toDF("g", "v"), Seq("g"), "v", D, W)
        .collect()(0).getSeq[Long](1)
    val merged = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(sk(a ++ b) == merged.toSeq)
    // the line vs the idempotent sketches: replaying the input doubles
    // every counter
    assert(sk(a ++ a) == sk(a).map(_ * 2L))
  }

  test("rollup of per-cell sketches == direct coarser sketch; length RAISES") {
    val rows = (1 to 1000).map(i => (s"t${i % 3}", s"d${i % 7}", s"user-${i % 211}"))
    val df = rows.toDF("typ", "day", "v")
    val fine = CountSketch.sketch(df, Seq("typ", "day"), "v", D, W)
    val direct = CountSketch.sketch(df, Seq("typ"), "v", D, W)
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val rolled = CountSketch.rollup(fine, "sketch", D, W, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(rolled.toSeq == direct.toSeq)
    intercept[Exception](
      CountSketch.rollup(fine, "sketch", 3, W, Seq("typ")).collect())
  }

  test("point estimate is centered where CMS only bounds: planted zipf") {
    // value k appears ~1000/k times: heavy head, long tail
    val rows = (1 to 40).flatMap(k => (1 to 1000 / k).map(_ => s"item-$k"))
    val df = rows.toDF("v")
    val cs = CountSketch.sketch(df, Nil, "v", D, W)
    val cms = CountMinSketch.sketch(df, Nil, "v", 4, W, out = "cms")
    val both = cs.crossJoin(cms)
    for (k <- Seq(1, 3, 10)) {
      val truth = 1000L / k
      val got = both.select(
        CountSketch.pointEstimate(col("sketch"), lit(s"item-$k"), D, W),
        CountMinSketch.estimate(col("cms"), lit(s"item-$k"), 4, W))
        .collect()(0)
      val (pt, up) = (got.getLong(0), got.getLong(1))
      assert(up >= truth, s"CMS must never under-read: k=$k $up < $truth")
      assert(math.abs(pt - truth) <= math.max(8L, (truth * 0.25).toLong),
        s"k=$k point=$pt truth=$truth")
    }
  }

  test("F2 and join-size reads land near planted truths; empty/disjoint floor at 0") {
    // A: value k × (50-k) for k in 1..49  -> F2(A) = Σ (50-k)²
    val a = (1 to 49).flatMap(k => (1 to (50 - k)).map(_ => s"v$k")).toDF("v")
    val trueF2 = (1 to 49).map(k => (50L - k) * (50L - k)).sum
    val skA = CountSketch.sketch(a, Nil, "v", D, W, out = "a")
    val f2 = skA.select(CountSketch.estimateF2(col("a"), D, W)
      .cast("long")).collect()(0).getLong(0)
    assert(math.abs(f2 - trueF2) <= (trueF2 * 0.35).toLong,
      s"F2 est $f2 vs $trueF2")
    // B: value k × k -> |A ⋈ B| = Σ k·(50-k)
    val b = (1 to 49).flatMap(k => (1 to k).map(_ => s"v$k")).toDF("v")
    val trueJoin = (1 to 49).map(k => k.toLong * (50L - k)).sum
    val skB = CountSketch.sketch(b, Nil, "v", D, W, out = "b")
    val js = skA.crossJoin(skB).select(
      CountSketch.estimateJoinSize(col("a"), col("b"), D, W).cast("long"))
      .collect()(0).getLong(0)
    assert(math.abs(js - trueJoin) <= (trueJoin * 0.35).toLong,
      s"join est $js vs $trueJoin")
    // disjoint value domains: estimate floors at 0, never negative
    val c = (1 to 200).map(i => s"zz$i").toDF("v")
    val skC = CountSketch.sketch(c, Nil, "v", D, W, out = "c")
    val dj = skA.crossJoin(skC).select(
      CountSketch.estimateJoinSize(col("a"), col("c"), D, W).cast("long"))
      .collect()(0).getLong(0)
    assert(dj >= 0L && dj <= trueJoin / 5, s"disjoint join est $dj")
  }

  test("NULLs carry no member; invalid shapes raise; weights gate like the CMS") {
    val df = Seq(Some("a"), None, Some("b")).toDF("v")
    val sk = CountSketch.sketch(df, Nil, "v", D, W)
    val mass = sk.select(aggregate(col("sketch"), lit(0L),
      (acc, x) => acc + abs(x))).collect()(0).getLong(0)
    // reference mass, not 2·D: "a" and "b" may share a slot with
    // opposite signs (signed cancellation is correct behavior)
    val expect = refCounters(Seq("a", "b")).values.map(math.abs).sum
    assert(mass == expect, s"NULL counted: $mass != $expect")
    intercept[IllegalArgumentException](
      CountSketch.sketch(df, Nil, "v", depth = 4, width = W)) // even depth
    intercept[IllegalArgumentException](
      CountSketch.sketch(df, Nil, "v", depth = 5, width = 100)) // not pow2
    val wdf = Seq(("a", 2L), ("b", -1L)).toDF("v", "w")
    intercept[Exception](CountSketch.sketch(wdf, Nil, "v", D, W,
      weightCol = Some("w")).collect())
  }

  test("the sketch plan is narrow: no join, no window; one sparse aggregation pair") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"u$i")).toDF("g", "v")
    val plan = CountSketch.sketch(df, Seq("g"), "v", D, W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "sketch should not join")
    assert(!plan.contains("Window"), "sketch should not window")
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.CountMinSketch

/** The portable count-min sketch's contracts: counters match an
  * independent driver-side md5-CMS reference, the state monoid is exact
  * (merge/rollup == direct, any split, any partitioning — duplicates
  * ADD, the multiset line vs the distinct sketch), the weighted form is
  * the count form at all-weights-1, invalid weights raise, and the
  * estimate read is one-sided (never under the true count; over by a
  * bounded overshoot on the fixture). The STATE is oracle-gated
  * (q228/q229/q230); the estimate is approximate by nature and pinned
  * here, like DistinctSketchSpec does for HLL estimates. */
class CountMinSketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 128

  /** Independent reference: md5 via MessageDigest, same slice layout —
    * depth row i buckets the 16-bit value of hex chars [4i, 4i+4). */
  private def refCounters(values: Seq[(String, Long)]): Map[Int, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.flatMap { case (s, w) =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until D).map { i =>
        val slice = Integer.parseInt(hex.slice(4 * i, 4 * i + 4), 16)
        (i * W + slice % W) -> w
      }
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
      .filter(_._2 > 0L)
  }

  private def gotCounters(df: org.apache.spark.sql.DataFrame,
                          weightCol: Option[String] = None): Map[Int, Long] =
    CountMinSketch.registers(df, Nil, "v", D, W, weightCol = weightCol)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap

  test("counters match the driver-side md5-CMS reference (strings and longs)") {
    val strs = (1 to 500).map(i => s"tok-${i % 37}") // repeats: counts > 1
    assert(gotCounters(strs.toDF("v")) == refCounters(strs.map((_, 1L))))
    val longs = (1L to 300L).map(i => i % 41L * 7919L)
    assert(gotCounters(longs.toDF("v")) ==
      refCounters(longs.map(v => (v.toString, 1L))))
  }

  test("weighted counters match reference; weight 1 == unweighted") {
    val rows = (1 to 200).map(i => (s"sku-${i % 23}", (i % 5).toLong))
    val got = gotCounters(rows.toDF("v", "w"), weightCol = Some("w"))
    assert(got == refCounters(rows))
    val ones = rows.map { case (v, _) => (v, 1L) }
    assert(gotCounters(ones.toDF("v", "w"), weightCol = Some("w")) ==
      gotCounters(ones.map(_._1).toDF("v")))
  }

  test("state monoid: sketch(A ⊎ B) == merge(sketch(A), sketch(B)); duplicates ADD") {
    val a = (1 to 400).map(i => ("g", s"u${i % 60}"))
    val b = (200 to 700).map(i => ("g", s"u${i % 60}"))
    def sk(xs: Seq[(String, String)]) =
      CountMinSketch.sketch(xs.toDF("g", "v"), Seq("g"), "v", D, W)
        .collect()(0).getSeq[Long](1)
    val merged = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(sk(a ++ b) == merged.toSeq)
    // NOT idempotent: doubling the input doubles every counter — the
    // multiset semantics that make it a frequency sketch
    assert(sk(a ++ a) == sk(a).map(_ * 2L).toSeq)
  }

  test("rollup of per-cell sketches == direct coarser sketch, any partitioning") {
    val rows = (1 to 600).map(i => (s"cell${i % 7}", s"v${i % 83}"))
    val df = rows.toDF("g", "v")
    val fine = CountMinSketch.sketch(df, Seq("g"), "v", D, W)
    val global = CountMinSketch.rollup(fine, "sketch", D, W, Nil)
      .collect()(0).getSeq[Long](0)
    val direct = CountMinSketch.sketch(df, Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    assert(global == direct)
    val shuffled = CountMinSketch.sketch(df.repartition(13), Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    assert(shuffled == direct)
  }

  test("estimate is one-sided: never under the true count; bounded over on the fixture") {
    // zipfish fixture: value k appears k times, k in 1..80
    val rows = (1 to 80).flatMap(k => Seq.fill(k)(s"item-$k"))
    val sk = CountMinSketch.sketch(rows.toDF("v"), Nil, "v", D, W)
    val n = rows.size.toLong
    val probes = (1 to 80).map(k => s"item-$k") ++ Seq("absent-1", "absent-2")
    val est = CountMinSketch.estimates(
        sk, "sketch", probes.toDF("p"), D, W)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = rows.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    truth.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v under-counted: ${est(v)} < $c")
    }
    // CMS guarantee: overshoot ≤ e/W · n with prob 1−e^−D; the fixture
    // is deterministic, so pin the observed bound (≈ 2.13% of n = 68)
    val cap = math.ceil(math.E / W * n).toLong
    (truth.keys ++ Seq("absent-1", "absent-2")).foreach { v =>
      val over = est(v) - truth.getOrElse(v, 0L)
      assert(over <= cap, s"$v overshoot $over > $cap")
    }
  }

  test("join-size estimate is one-sided: never under |A JOIN B|; bounded over on the fixture") {
    // A: key k appears k times (k in 1..40); B: keys 20..60 three times
    val a = (1 to 40).flatMap(k => Seq.fill(k)(s"k$k"))
    val b = (20 to 60).flatMap(k => Seq.fill(3)(s"k$k"))
    val truth = (20 to 40).map(k => k.toLong * 3L).sum // Σ fA·fB
    val skA = CountMinSketch.sketch(a.toDF("v"), Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    val skB = CountMinSketch.sketch(b.toDF("v"), Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    val est = Seq((skA, skB)).toDF("a", "b")
      .select(CountMinSketch.estimateJoinSize(col("a"), col("b"), D, W))
      .collect()(0).getLong(0)
    assert(est >= truth, s"join size under-estimated: $est < $truth")
    // one-sided bound: over by <= e/W * |A|*|B| w.h.p.; deterministic
    // fixture, pin the observed bound
    val cap = math.ceil(math.E / W * a.size.toLong * b.size.toLong).toLong
    assert(est - truth <= cap, s"overshoot ${est - truth} > $cap")
    // disjoint domains estimate ~0 (collisions only)
    val c = (1 to 30).map(k => s"other$k")
    val skC = CountMinSketch.sketch(c.toDF("v"), Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    val estAC = Seq((skA, skC)).toDF("a", "b")
      .select(CountMinSketch.estimateJoinSize(col("a"), col("b"), D, W))
      .collect()(0).getLong(0)
    assert(estAC <= cap, s"disjoint estimate $estAC above collision bound $cap")
  }

  test("planner reads: DOUBLE join-size/hot-key bounds are one-sided; strategy matches the planted regime") {
    // the q237-family bound property carried over to the planner path:
    // never under the truth, on BOTH reads
    val a = (1 to 40).flatMap(k => Seq.fill(k)(s"k$k"))
    val b = (20 to 60).flatMap(k => Seq.fill(3)(s"k$k"))
    val truthJoin = (20 to 40).map(k => k.toLong * 3L).sum
    val truthHot = 40L * 3L // hottest key's fA·fB
    def sk(xs: Seq[String]) = CountMinSketch.sketch(xs.toDF("v"), Nil, "v", D, W)
      .collect()(0).getSeq[Long](0)
    val df = Seq((sk(a), sk(b))).toDF("a", "b")
    val r = df.select(
      CountMinSketch.estimateJoinSizeD(col("a"), col("b"), D, W),
      CountMinSketch.estimateHotJoinKeyD(col("a"), col("b"), D, W),
      CountMinSketch.estimateJoinSize(col("a"), col("b"), D, W)).head()
    assert(r.getDouble(0) >= truthJoin.toDouble, "join size under-estimated")
    assert(r.getDouble(1) >= truthHot.toDouble, "hot-key bound under the true hottest key")
    // the DOUBLE read agrees with the exact read on in-range counters
    assert(math.abs(r.getDouble(0) - r.getLong(2).toDouble) < 1e-6)

    // strategy decisions on planted regimes (thresholds scaled to the fixture)
    def strat(av: Seq[Long], bv: Seq[Long], bcast: Long, minRows: Long = 100L) =
      Seq((av, bv)).toDF("a", "b").select(CountMinSketch.joinStrategy(
        col("a"), col("b"), D, W, bcast, skewShare1e6 = 200000L,
        skewMinRows = minRows)).head().getString(0)
    // tiny right side → broadcast regardless of skew
    assert(strat(sk(a), sk(Seq("k1", "k2")), bcast = 10L) == "broadcast")
    // one key owns most of the output → salted
    val hotL = Seq.fill(300)("hot") ++ (1 to 100).map(i => s"c$i")
    val hotR = Seq.fill(300)("hot") ++ (1 to 100).map(i => s"c$i")
    assert(strat(sk(hotL), sk(hotR), bcast = 10L) == "salted")
    // uniform × uniform, both above broadcast size → shuffle
    val u1 = (1 to 400).map(i => s"u${i % 200}")
    val u2 = (1 to 400).map(i => s"u${i % 200}")
    assert(strat(sk(u1), sk(u2), bcast = 10L) == "shuffle")
    // the skewMinRows floor: the same skewed shape below the floor stays shuffle
    assert(strat(sk(hotL), sk(hotR), bcast = 10L, minRows = 10000000L) == "shuffle")
  }

  test("total recovers the exact weight sum; empty input is the zero vector") {
    val rows = (1 to 99).map(i => (s"v${i % 9}", i.toLong))
    val sk = CountMinSketch.sketch(rows.toDF("v", "w"), Nil, "v", D, W,
      weightCol = Some("w"))
    val tot = sk.select(CountMinSketch.total(col("sketch"), W)).collect()(0).getLong(0)
    assert(tot == rows.map(_._2).sum)
    val empty = CountMinSketch.sketch(
      Seq.empty[(String, String)].toDF("g", "v").filter(lit(false)), Nil, "v", D, W)
    assert(empty.collect()(0).getSeq[Long](0).forall(_ == 0L))
  }

  test("NULL and negative weights raise; NULL values are ignored") {
    val bad = Seq(("a", Some(1L)), ("b", None)).toDF("v", "w")
      .select(col("v"), col("w").cast(LongType).as("w"))
    val e1 = intercept[Exception] {
      CountMinSketch.sketch(bad, Nil, "v", D, W, weightCol = Some("w")).collect()
    }
    assert(e1.getMessage.contains("non-negative"))
    val neg = Seq(("a", 1L), ("b", -2L)).toDF("v", "w")
    val e2 = intercept[Exception] {
      CountMinSketch.sketch(neg, Nil, "v", D, W, weightCol = Some("w")).collect()
    }
    assert(e2.getMessage.contains("non-negative"))
    val withNulls = Seq(Some("x"), None, Some("x")).toDF("v")
    val sk = CountMinSketch.sketch(withNulls, Nil, "v", D, W)
    val tot = sk.select(CountMinSketch.total(col("sketch"), W)).collect()(0).getLong(0)
    assert(tot == 2L) // the NULL row named no member
  }

  test("rollup raises on a mismatched stored shape") {
    val df = Seq((1L, Seq(1L, 2L, 3L))).toDF("g", "sketch")
    val e = intercept[Exception] {
      CountMinSketch.rollup(df, "sketch", D, W, Nil).collect()
    }
    assert(e.getMessage.contains("shape must match"))
  }

  test("shape guards: bad depth/width rejected") {
    intercept[IllegalArgumentException](CountMinSketch.slots(0, 128))
    intercept[IllegalArgumentException](CountMinSketch.slots(9, 128))
    intercept[IllegalArgumentException](CountMinSketch.slots(4, 100)) // not 2^k
    intercept[IllegalArgumentException](CountMinSketch.slots(4, 512)) // 2048 > 1024
    assert(CountMinSketch.slots(4, 128) == 512)
    assert(CountMinSketch.slots(8, 128) == 1024)
  }
}

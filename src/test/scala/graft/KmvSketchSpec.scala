package graft

import org.apache.spark.sql.functions._

import graft.operators.KmvSketch

/** The portable KMV set sketch's contracts: registers match an
  * independent driver-side md5-min reference, the state monoid is exact
  * (merge/rollup == direct, any split, duplicates absorbed), the
  * distinct estimate stays within KMV error across cardinality regimes,
  * and the SET-OPERATION reads (Jaccard / intersection / difference —
  * the capability HLL's inclusion-exclusion lacks) land near planted
  * truths. The state AND the rational reads are oracle-gated
  * (q240–q244); the moment-matched estimator (n̂ = m·hits·D/Σ —
  * consistent across all regimes, no small-range switch) has its
  * accuracy pinned here. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: md5 via MessageDigest, same slice layout —
    * bucket = first hexChars chars, register = 1 + next 12 chars as a
    * 48-bit int, MIN per bucket. */
  private def refRegisters(values: Seq[String], hexChars: Int): Map[Int, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.distinct.map { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.take(hexChars), 16)
      val r = java.lang.Long.parseLong(
        hex.slice(hexChars, hexChars + 12), 16) + 1L
      (bucket, r)
    }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).min }
  }

  private def gotRegisters(df: org.apache.spark.sql.DataFrame,
                           hexChars: Int): Map[Int, Long] =
    KmvSketch.registers(df, Nil, "v", hexChars)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap

  test("registers match the driver-side md5-min reference (strings and longs)") {
    val strs = (1 to 500).map(i => s"doc-$i")
    assert(gotRegisters(strs.toDF("v"), 2) == refRegisters(strs, 2))
    val longs = (1L to 300L).map(_ * 7919L)
    assert(gotRegisters(longs.toDF("v"), 2) ==
      refRegisters(longs.map(_.toString), 2))
    assert(gotRegisters(strs.toDF("v"), 1) == refRegisters(strs, 1))
  }

  test("state monoid: sketch(A ∪ B) == merge(sketch(A), sketch(B)), duplicates absorbed") {
    val a = (1 to 400).map(i => ("g", s"u$i"))
    val b = (200 to 700).map(i => ("g", s"u$i")) // overlap 200..400
    def sk(xs: Seq[(String, String)]) =
      KmvSketch.sketch(xs.toDF("g", "v"), Seq("g"), "v")
        .collect()(0).getSeq[Long](1)
    // element-wise min with the 0 = never-hit sentinel treated as +∞
    val merged = sk(a).zip(sk(b)).map {
      case (0L, y) => y
      case (x, 0L) => x
      case (x, y)  => math.min(x, y)
    }
    assert(sk(a ++ b) == merged.toSeq)
    // idempotent: duplicating the whole input changes nothing
    assert(sk(a ++ a) == sk(a))
  }

  test("rollup of per-cell sketches == direct coarser sketch, any partitioning; length RAISES") {
    val rows = (1 to 1000).map(i => (s"t${i % 3}", s"d${i % 7}", s"user-${i % 211}"))
    val df = rows.toDF("typ", "day", "v")
    val fine = KmvSketch.sketch(df, Seq("typ", "day"), "v")
    val direct = KmvSketch.sketch(df, Seq("typ"), "v")
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val rolled = KmvSketch.rollup(fine, "kmv", 2, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(rolled.toSeq == direct.toSeq)
    val shuffled = KmvSketch.rollup(fine.repartition(17, col("day")),
        "kmv", 2, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(shuffled.toSeq == direct.toSeq)
    intercept[Exception](
      KmvSketch.rollup(fine, "kmv", 1, Seq("typ")).collect())
  }

  test("estimate within KMV error across cardinality regimes; empty/single exact") {
    // m=256 -> rsd ~6.5%; allow 3*rsd = 20%. The moment-matched form
    // stays consistent in the n ~ m regime where the naive harmonic
    // estimator reads ~50% low (caught by this wave's first draft).
    for (n <- Seq(25, 400, 20000)) {
      val df = (1 to n).map(i => s"item-$i").toDF("v")
      val sk = KmvSketch.sketch(df, Nil, "v")
      val got = sk.select(KmvSketch.estimate(col("kmv"), 2))
        .collect()(0).getLong(0)
      assert(math.abs(got - n) <= math.max(2L, (n * 0.20).toLong),
        s"n=$n est=$got")
    }
    val empty = KmvSketch.sketch(Seq.empty[String].toDF("v"), Nil, "v")
    assert(empty.select(KmvSketch.estimate(col("kmv"), 2))
      .collect()(0).getLong(0) == 0L)
    assert(empty.select(KmvSketch.estimateRational(col("kmv"), 2))
      .collect()(0).getLong(0) == 0L) // rational is EXACTLY 0 on empty
    val one = KmvSketch.sketch(Seq("x", "x", "x").toDF("v"), Nil, "v")
    assert(one.select(KmvSketch.estimate(col("kmv"), 2))
      .collect()(0).getLong(0) == 1L)
  }

  test("NULL values carry no set member; bad hexChars raises") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val sk = KmvSketch.sketch(df, Nil, "v")
    assert(sk.select(KmvSketch.estimate(col("kmv"), 2))
      .collect()(0).getLong(0) == 2L)
    intercept[IllegalArgumentException](
      KmvSketch.sketch(df, Nil, "v", hexChars = 3))
    intercept[IllegalArgumentException](
      KmvSketch.sketch(df, Nil, "v", hexChars = 0))
  }

  test("set-operation reads land near planted truths (the over-HLL capability)") {
    // |A| = 1000, |B| = 1000, |A∩B| = 500, |A∪B| = 1500, J = 1/3.
    // Jaccard rsd = sqrt(J(1-J)/m) ~ 2.9% absolute at m = 256; the
    // intersection inherits union-relative error instead of the HLL
    // read's added operand-absolute errors.
    val a = (1 to 1000).map(i => s"k$i")
    val b = (501 to 1500).map(i => s"k$i")
    def sk(xs: Seq[String]) = KmvSketch.sketch(xs.toDF("v"), Nil, "v")
    val pair = sk(a).crossJoin(sk(b).withColumnRenamed("kmv", "kv_b"))
    val row = pair.select(
      KmvSketch.jaccard(col("kmv"), col("kv_b"), 2).as("j"),
      KmvSketch.estimateIntersection(col("kmv"), col("kv_b"), 2).as("i"),
      KmvSketch.estimateDifference(col("kmv"), col("kv_b"), 2).as("dab"),
      KmvSketch.estimateRational(
        KmvSketch.merge(col("kmv"), col("kv_b")), 2).as("u"))
      .collect()(0)
    assert(math.abs(row.getDouble(0) - 1.0 / 3) <= 0.12,
      s"jaccard ${row.getDouble(0)}")
    assert(math.abs(row.getLong(1) - 500L) <= 200L, s"inter ${row.getLong(1)}")
    assert(math.abs(row.getLong(2) - 500L) <= 250L, s"diff ${row.getLong(2)}")
    assert(math.abs(row.getLong(3) - 1500L) <= 300L, s"union ${row.getLong(3)}")
    // disjoint sets: intersection reads (near) 0, never negative
    val dj = sk((1 to 300).map(i => s"x$i"))
      .crossJoin(sk((1 to 300).map(i => s"y$i")).withColumnRenamed("kmv", "kv_b"))
      .select(KmvSketch.estimateIntersection(col("kmv"), col("kv_b"), 2),
        KmvSketch.jaccard(col("kmv"), col("kv_b"), 2))
      .collect()(0)
    assert(dj.getLong(0) >= 0L && dj.getLong(0) <= 60L, s"disjoint ${dj.getLong(0)}")
    assert(dj.getDouble(1) <= 0.1, s"disjoint J ${dj.getDouble(1)}")
  }

  test("3-way reads: planted triple overlap; identical sets read inter == union exactly") {
    // |A∩B∩C| = |{751..1000}| = 250, |A∪B∪C| = 1750
    val a = (1 to 1000).map(i => s"k$i")
    val b = (501 to 1500).map(i => s"k$i")
    val c = (751 to 1750).map(i => s"k$i")
    def sk(xs: Seq[String], out: String) =
      KmvSketch.sketch(xs.toDF("v"), Nil, "v").withColumnRenamed("kmv", out)
    val row = sk(a, "ka").crossJoin(sk(b, "kb")).crossJoin(sk(c, "kc"))
      .select(
        KmvSketch.estimateIntersection3(col("ka"), col("kb"), col("kc"), 2)
          .as("i3"),
        KmvSketch.estimateRational(
          KmvSketch.merge(KmvSketch.merge(col("ka"), col("kb")), col("kc")),
          2).as("u3"),
        KmvSketch.matches3(col("ka"), col("kb"), col("kc")).as("m3"))
      .collect()(0)
    assert(math.abs(row.getLong(0) - 250L) <= 120L, s"inter3 ${row.getLong(0)}")
    assert(math.abs(row.getLong(1) - 1750L) <= 350L, s"union3 ${row.getLong(1)}")
    // identical sets: every hit register agrees -> j3 = 1 exactly, so
    // the intersection read IS the union read
    val same = sk(a, "x").crossJoin(sk(a, "y")).crossJoin(sk(a, "z"))
      .select(KmvSketch.estimateIntersection3(col("x"), col("y"), col("z"), 2),
        KmvSketch.estimateRational(col("x"), 2))
      .collect()(0)
    assert(same.getLong(0) == same.getLong(1), s"identical: $same")
  }

  test("setops: exact integer reads match the driver reference; pairs ordered key_a < key_b") {
    val rows = (1 to 900).flatMap { i =>
      val u = s"u${i % 450}"
      Seq(("alpha", u)) ++ (if (i % 2 == 0) Seq(("beta", u)) else Nil) ++
        (if (i % 3 == 0) Seq(("gamma", u)) else Nil)
    }
    val got = KmvSketch.setops(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set(("alpha", "beta"), ("alpha", "gamma"),
      ("beta", "gamma")))
    // driver reference for (matches, hits) from refRegisters
    def reg(k: String) = refRegisters(
      rows.filter(_._1 == k).map(_._2), 2)
    for (((ka, kb), (m, h)) <- got) {
      val (ra, rb) = (reg(ka), reg(kb))
      val refM = ra.count { case (bk, r) => rb.get(bk).contains(r) }
      val refH = (ra.keySet ++ rb.keySet).size
      assert((m, h) == (refM.toLong, refH.toLong), s"($ka,$kb)")
    }
  }

  test("the sketch plan is ONE aggregation — no join, no window, no explode of values") {
    val df = (1 to 100).map(i => (s"g${i % 3}", s"u$i")).toDF("g", "v")
    val plan = KmvSketch.sketch(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "sketch should not join")
    assert(!plan.contains("Window"), "sketch should not window")
    // map-side combine: a partial aggregate precedes the exchange
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
  }
}

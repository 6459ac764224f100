package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val LO = 0L
  private val HI = 100L
  private val BINS = 20 // width 5

  /** classic lower quantile: smallest v with |{x ≤ v}| ≥ ⌈q·n⌉ */
  private def exactLower(vs: Seq[Long], num: Int, den: Int): Long = {
    val s = vs.sorted
    val rank = (s.size.toLong * num + den - 1) / den
    s((rank - 1).toInt)
  }

  test("cube contract: sketch(A ⊎ B) == merge(sketch(A), sketch(B)), exactly") {
    val rnd = new scala.util.Random(7)
    val all = (1 to 500).map(_ => rnd.nextInt(140).toLong - 20) // spills both slots
    val (a, b) = all.splitAt(173)
    def sk(vs: Seq[Long]): Seq[Long] =
      QuantileSketch.sketch(vs.toDF("v"), Nil, "v", LO, HI, BINS)
        .select("sketch").as[Seq[Long]].head()
    val merged = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(merged == sk(all))
  }

  test("rollup over stored sketches == sketch of the union, any grouping") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 600).map(i =>
      (s"g${i % 3}", s"s${i % 7}", rnd.nextInt(100).toLong))
    val df = rows.toDF("g", "sub", "v")
    val fine = QuantileSketch.sketch(df, Seq("g", "sub"), "v", LO, HI, BINS)
    val rolled = QuantileSketch.rollup(fine, "sketch", BINS, Seq("g"))
      .as[(String, Seq[Long])].collect().toMap
    val direct = QuantileSketch.sketch(df, Seq("g"), "v", LO, HI, BINS)
      .as[(String, Seq[Long])].collect().toMap
    assert(rolled == direct)
    // global rollup (empty group list) == one global sketch
    val globalRolled = QuantileSketch.rollup(fine, "sketch", BINS, Nil)
      .select("sketch").as[Seq[Long]].head()
    val globalDirect = QuantileSketch.sketch(df, Nil, "v", LO, HI, BINS)
      .select("sketch").as[Seq[Long]].head()
    assert(globalRolled == globalDirect)
  }

  test("merge column ⊕ is the element-wise sum") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(10L, 0L, 5L))).toDF("a", "b")
    assert(df.select(QuantileSketch.merge(col("a"), col("b")))
      .as[Seq[Long]].head() == Seq(11L, 2L, 8L))
  }

  test("integer domain at width 1: quantiles are exact") {
    val rnd = new scala.util.Random(3)
    val vs = (1 to 777).map(_ => rnd.nextInt(50).toLong + 1)
    val sk = QuantileSketch.sketch(vs.toDF("v"), Nil, "v", 1L, 51L, 50)
    val got = sk.select(
      QuantileSketch.total(col("sketch")).as("n"),
      QuantileSketch.quantileLower(col("sketch"), 1, 2, 1L, 51L, 50).as("p50"),
      QuantileSketch.quantileLower(col("sketch"), 9, 10, 1L, 51L, 50).as("p90"),
      QuantileSketch.quantileLower(col("sketch"), 1, 777, 1L, 51L, 50).as("min"),
      QuantileSketch.quantileLower(col("sketch"), 777, 777, 1L, 51L, 50).as("max"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((777L, exactLower(vs, 1, 2), exactLower(vs, 9, 10),
      vs.min, vs.max)))
  }

  test("error bound: coarse bins stay within one bin width of exact") {
    val rnd = new scala.util.Random(19)
    val vs = (1 to 1000).map(_ => rnd.nextInt(10000).toLong)
    val (lo, hi, bins) = (0L, 10000L, 100) // width 100
    val sk = QuantileSketch.sketch(vs.toDF("v"), Nil, "v", lo, hi, bins)
    for ((num, den) <- Seq((1, 4), (1, 2), (3, 4), (9, 10), (99, 100))) {
      val got = sk.select(QuantileSketch.quantileLower(col("sketch"),
        num, den, lo, hi, bins)).as[Long].head()
      val exact = exactLower(vs, num, den)
      assert(got <= exact && exact < got + 100,
        s"q=$num/$den: got $got, exact $exact")
    }
  }

  test("edges: empty → NULL, underflow → NULL, overflow → hi, NULLs ignored") {
    val sk0 = QuantileSketch.sketch(
      Seq.empty[Long].toDF("v"), Nil, "v", LO, HI, BINS)
    // an empty input has no groups at all for grouped sketches; the
    // global (no-group) aggregate still emits one all-zero sketch row
    assert(sk0.select(QuantileSketch.total(col("sketch"))).as[Long].head() == 0L)
    assert(sk0.select(QuantileSketch.quantileLower(col("sketch"), 1, 2,
      LO, HI, BINS)).as[Option[Long]].head().isEmpty)
    val under = QuantileSketch.sketch(Seq(-5L, -1L, 3L).toDF("v"), Nil, "v", LO, HI, BINS)
    assert(under.select(QuantileSketch.quantileLower(col("sketch"), 1, 2,
      LO, HI, BINS)).as[Option[Long]].head().isEmpty) // rank 2 of 3 → slot 0
    val over = QuantileSketch.sketch(Seq(1L, 500L, 600L).toDF("v"), Nil, "v", LO, HI, BINS)
    assert(over.select(QuantileSketch.quantileLower(col("sketch"), 2, 3,
      LO, HI, BINS)).as[Long].head() == HI)
    val withNulls = QuantileSketch.sketch(
      Seq(Some(10L), None, Some(20L)).toDF("v"), Nil, "v", LO, HI, BINS)
    assert(withNulls.select(QuantileSketch.total(col("sketch"))).as[Long].head() == 2L)
  }

  test("validation: domain, bins, columns") {
    val df = Seq((1L, "a")).toDF("v", "g")
    intercept[IllegalArgumentException](
      QuantileSketch.sketch(df, Nil, "v", 10L, 10L, 5)) // empty domain
    intercept[IllegalArgumentException](
      QuantileSketch.sketch(df, Nil, "v", 0L, 10L, 3)) // non-integral width
    intercept[IllegalArgumentException](
      QuantileSketch.sketch(df, Nil, "v", 0L, 10L, 2000)) // bins cap
    intercept[IllegalArgumentException](
      QuantileSketch.sketch(df, Nil, "nope", 0L, 10L, 5))
    intercept[IllegalArgumentException](
      QuantileSketch.sketch(df.withColumn("d", lit(1.0)), Nil, "d", 0L, 10L, 5))
    intercept[IllegalArgumentException](
      QuantileSketch.quantileLower(col("s"), 3, 2, 0L, 10L, 5)) // num > den
    // den bound: the cross-multiplied rank test (cum·den ≥ n·num) must
    // stay inside Int64 — huge den would silently pick the wrong slot
    intercept[IllegalArgumentException](
      QuantileSketch.quantileLower(col("s"), 1, 2000000, 0L, 10L, 5))
  }

  test("weighted sketch: all-weights-1 == count sketch; weighted quantile exact") {
    val rnd = new scala.util.Random(31L)
    val rows = Seq.fill(500)((rnd.nextInt(50).toLong + 1L, rnd.nextInt(100).toLong + 1L))
    val df = rows.toDF("v", "w")
    // the count sketch IS the all-weights-1 case (same arithmetic path)
    val ones = QuantileSketch.sketch(df.withColumn("w", lit(1L)),
      Nil, "v", 1L, 51L, 50, weightCol = Some("w"))
      .select("sketch").as[Seq[Long]].head()
    val counts = QuantileSketch.sketch(df, Nil, "v", 1L, 51L, 50)
      .select("sketch").as[Seq[Long]].head()
    assert(ones == counts)
    // weighted p50 at width 1 == the driver-side weighted lower quantile
    val sk = QuantileSketch.sketch(df, Nil, "v", 1L, 51L, 50,
      weightCol = Some("w"))
    val got = sk.select(
      QuantileSketch.total(col("sketch")).as("n"),
      QuantileSketch.quantileLower(col("sketch"), 1, 2, 1L, 51L, 50).as("q"))
      .as[(Long, Long)].head()
    val totalW = rows.map(_._2).sum
    assert(got._1 == totalW)
    val ref = {
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.find { case (_, w) => cum += w; cum * 2 >= totalW }.get._1
    }
    assert(got._2 == ref, s"weighted p50 ${got._2} != $ref")
    // the cube contract survives weights: split-merge == direct
    val (a, b) = rows.splitAt(213)
    val merged = QuantileSketch.sketch(a.toDF("v", "w"), Nil, "v", 1L, 51L, 50,
        weightCol = Some("w")).select(col("sketch").as("a"))
      .crossJoin(QuantileSketch.sketch(b.toDF("v", "w"), Nil, "v", 1L, 51L, 50,
        weightCol = Some("w")).select(col("sketch").as("b")))
      .select(QuantileSketch.merge(col("a"), col("b"))).as[Seq[Long]].head()
    assert(merged == sk.select("sketch").as[Seq[Long]].head())
  }

  test("weighted sketch: NULL or negative weight RAISES") {
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val neg = Seq((5L, 2L), (7L, -1L)).toDF("v", "w")
    val e1 = intercept[Exception](QuantileSketch.sketch(neg, Nil, "v",
      1L, 51L, 50, weightCol = Some("w")).collect())
    assert(m(e1).contains("non-negative"), m(e1))
    val nul = Seq((5L, Some(2L)), (7L, None)).toDF("v", "w")
    val e2 = intercept[Exception](QuantileSketch.sketch(nul, Nil, "v",
      1L, 51L, 50, weightCol = Some("w")).collect())
    assert(m(e2).contains("non-negative"), m(e2))
    intercept[IllegalArgumentException](QuantileSketch.sketch(
      neg.withColumn("d", lit(1.0)), Nil, "v", 1L, 51L, 50,
      weightCol = Some("d"))) // non-BIGINT weight
  }

  test("rollup: a bins mismatched with the stored array length RAISES") {
    // sketch written at 10 bins (12 slots); rolling up at 5 bins would
    // silently drop the overflow counts, at 20 would zero-fill — both
    // must raise instead
    val sk = QuantileSketch.sketch(
      (1L to 40L).toDF("v"), Seq.empty, "v", 0L, 40L, 10)
    for (wrong <- Seq(5, 20)) {
      val e = intercept[Exception](
        QuantileSketch.rollup(sk, "sketch", wrong, Nil).collect())
      assert(e.getMessage.contains("bins must match the stored sketch") ||
        Option(e.getCause).exists(
          _.getMessage.contains("bins must match the stored sketch")),
        s"bins=$wrong: ${e.getMessage}")
    }
    // the matching bins still rolls up exactly
    val ok = QuantileSketch.rollup(sk, "sketch", 10, Nil)
      .select(QuantileSketch.total(col("sketch"))).as[Long].head()
    assert(ok == 40L)
  }

  test("sketch total × den past Int64 raises eagerly in quantileLower") {
    // two huge weights sum inside Int64, but total·4 does not: the read
    // must fail with the eager guard message, not a generic ANSI overflow
    val df = Seq((5L, Long.MaxValue / 2), (6L, Long.MaxValue / 2)).toDF("v", "w")
    val sk = QuantileSketch.sketch(df, Seq.empty, "v", 0L, 10L, 10,
      weightCol = Some("w"))
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val e = intercept[Exception](sk.select(
      QuantileSketch.quantileLower(col("sketch"), 1, 4, 0L, 10L, 10)).collect())
    assert(m(e).contains("overflows Int64"), m(e))
    // an in-bounds total still reads fine through the guard
    val ok = QuantileSketch.sketch(Seq((5L, 3L)).toDF("v", "w"), Seq.empty,
        "v", 0L, 10L, 10, weightCol = Some("w"))
      .select(QuantileSketch.quantileLower(col("sketch"), 1, 2, 0L, 10L, 10))
      .as[Long].head()
    assert(ok == 5L)
  }
}

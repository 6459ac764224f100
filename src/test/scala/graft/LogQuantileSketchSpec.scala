package graft

import org.apache.spark.sql.functions._

import graft.operators.LogQuantileSketch

class LogQuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  // mixed-magnitude corpus: zeros, single digits, mid, huge — the
  // unknown-domain shape the sketch exists for
  private def corpus(seed: Long, n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n) {
      rnd.nextInt(4) match {
        case 0 => rnd.nextInt(10).toLong                 // 0..9 (exact zone)
        case 1 => rnd.nextInt(100000).toLong             // mid
        case 2 => math.abs(rnd.nextLong()) % 1000000000L // wide
        case 3 => math.abs(rnd.nextLong())               // full Long range
      }
    }
  }

  /** Exact classic lower quantile: smallest value whose rank reaches
    * ⌈(num·n)/den⌉. */
  private def exactLower(vs: Seq[Long], num: Int, den: Int): Long = {
    val s = vs.sorted
    val rank = (num.toLong * s.size + den - 1) / den // ceil
    s((rank - 1).toInt)
  }

  test("merge contract: rollup(sketch(A) ∪ sketch(B)) == sketch(A ⊎ B), exactly") {
    for (digits <- Seq(1, 2, 3)) {
      val a = corpus(7L * digits, 400)
      val b = corpus(11L * digits, 300)
      val skA = LogQuantileSketch.sketch(a.toDF("v"), Seq.empty, "v", digits)
      val skB = LogQuantileSketch.sketch(b.toDF("v"), Seq.empty, "v", digits)
      val merged = LogQuantileSketch.rollup(skA.union(skB), Seq.empty)
        .orderBy("edge").as[(Long, Long)].collect().toSeq
      val direct = LogQuantileSketch.sketch((a ++ b).toDF("v"), Seq.empty, "v", digits)
        .orderBy("edge").as[(Long, Long)].collect().toSeq
      assert(merged == direct, s"digits=$digits")
    }
  }

  test("grouped rollup == direct coarse sketch (binning is grouping-independent)") {
    val rnd = new scala.util.Random(3L)
    val rows = corpus(5L, 600).map(v =>
      (s"g${rnd.nextInt(3)}", s"s${rnd.nextInt(4)}", v))
    val df = rows.toDF("g", "sub", "v")
    val fine = LogQuantileSketch.sketch(df, Seq("g", "sub"), "v")
    val rolled = LogQuantileSketch.rollup(fine, Seq("g"))
      .orderBy("g", "edge").as[(String, Long, Long)].collect().toSeq
    val direct = LogQuantileSketch.sketch(df, Seq("g"), "v")
      .orderBy("g", "edge").as[(String, Long, Long)].collect().toSeq
    assert(rolled == direct)
  }

  test("quantile answer == bucketEdge(true lower quantile) — error one bucket") {
    val vs = corpus(17L, 2000)
    val sk = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", 2)
    val got = LogQuantileSketch.quantiles(sk, Seq.empty,
      Seq((1, 4), (1, 2), (3, 4), (99, 100)))
      .select("n", "q_1_4", "q_1_2", "q_3_4", "q_99_100")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got._1 == vs.size)
    for (((num, den), ans) <- Seq((1, 4), (1, 2), (3, 4), (99, 100))
           .zip(Seq(got._2, got._3, got._4, got._5))) {
      val exact = exactLower(vs, num, den)
      assert(ans == LogQuantileSketch.edgeOf(exact, 2),
        s"q=$num/$den: $ans vs exact $exact")
      assert(ans <= exact, s"q=$num/$den")
      // relative error < 10^(1-digits) = 10% at digits=2 (exact below 100)
      assert(exact - ans <= exact / 10, s"q=$num/$den: $ans vs $exact")
    }
  }

  test("values below 10^digits are EXACT; zero lands in its own bucket") {
    val vs: Seq[Long] = Seq(0L, 0L, 1L, 5L, 7L, 42L, 99L)
    val sk = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", 2)
    // every value its own edge (digits <= 2 → identity binning)
    assert(sk.orderBy("edge").as[(Long, Long)].collect().toSeq ==
      Seq((0L, 2L), (1L, 1L), (5L, 1L), (7L, 1L), (42L, 1L), (99L, 1L)))
    val q = LogQuantileSketch.quantiles(sk, Seq.empty, Seq((1, 2)))
      .select("q_1_2").as[Long].head()
    assert(q == exactLower(vs, 1, 2))
  }

  test("bounded state: a wide corpus occupies at most maxBuckets(digits) buckets") {
    val vs = corpus(23L, 20000)
    for (digits <- Seq(1, 2)) {
      val n = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", digits).count()
      assert(n <= LogQuantileSketch.maxBuckets(digits),
        s"digits=$digits: $n buckets > ${LogQuantileSketch.maxBuckets(digits)}")
    }
    // reference edges agree with the column expression on every value
    val spark2 = spark
    import spark2.implicits._
    val viaCol = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", 2)
      .orderBy("edge").as[(Long, Long)].collect().toSeq
    val viaRef = vs.groupBy(LogQuantileSketch.edgeOf(_, 2)).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(viaCol == viaRef)
  }

  test("weighted: all-weights-1 == count sketch; weighted quantile reference; bad weight raises") {
    val rnd = new scala.util.Random(41L)
    val rows = corpus(13L, 600).map(v => (v, rnd.nextInt(50).toLong + 1L))
    val df = rows.toDF("v", "w")
    val ones = LogQuantileSketch.sketch(df.withColumn("w", lit(1L)),
        Seq.empty, "v", 2, weightCol = Some("w"))
      .orderBy("edge").as[(Long, Long)].collect().toSeq
    val counts = LogQuantileSketch.sketch(df, Seq.empty, "v", 2)
      .orderBy("edge").as[(Long, Long)].collect().toSeq
    assert(ones == counts)
    // weighted p50: answer == bucketEdge(weighted lower quantile)
    val sk = LogQuantileSketch.sketch(df, Seq.empty, "v", 2, weightCol = Some("w"))
    val got = LogQuantileSketch.quantiles(sk, Seq.empty, Seq((1, 2)))
      .select("n", "q_1_2").as[(Long, Long)].head()
    val totalW = rows.map(_._2).sum
    assert(got._1 == totalW)
    val ref = {
      val sorted = rows.sortBy(r => LogQuantileSketch.edgeOf(r._1, 2))
      var cum = 0L
      sorted.find { case (_, w) => cum += w; cum * 2 >= totalW }.get._1
    }
    assert(got._2 == LogQuantileSketch.edgeOf(ref, 2),
      s"weighted p50 ${got._2} vs ref value $ref")
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val e1 = intercept[Exception](LogQuantileSketch.sketch(
      Seq((5L, -1L)).toDF("v", "w"), Seq.empty, "v", 2,
      weightCol = Some("w")).collect())
    assert(m(e1).contains("non-negative"), m(e1))
    val e2 = intercept[Exception](LogQuantileSketch.sketch(
      Seq((5L, Option.empty[Long])).toDF("v", "w"), Seq.empty, "v", 2,
      weightCol = Some("w")).collect())
    assert(m(e2).contains("non-negative"), m(e2))
    intercept[IllegalArgumentException](LogQuantileSketch.sketch(
      df.withColumn("d", lit(1.0)), Seq.empty, "v", 2, weightCol = Some("d")))
  }

  test("signed line: negatives exact below 10^digits; Long.MinValue RAISES; NULLs ignored") {
    // |v| < 10^digits → identity binning on BOTH sides of zero
    val vs: Seq[Long] = Seq(-99L, -42L, -7L, -1L, 0L, 3L, 88L)
    val sk = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", 2)
    assert(sk.orderBy("edge").as[(Long, Long)].collect().toSeq ==
      vs.map(v => (v, 1L)))
    val q = LogQuantileSketch.quantiles(sk, Seq.empty, Seq((1, 2)))
      .select("q_1_2").as[Long].head()
    assert(q == exactLower(vs, 1, 2))
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val e = intercept[Exception](LogQuantileSketch.sketch(
      Seq(Long.MinValue).toDF("v"), Seq.empty, "v").collect())
    assert(m(e).contains("no Long magnitude"), m(e))
    val withNulls = Seq(Some(10L), None, Some(-20L)).toDF("v")
    assert(LogQuantileSketch.sketch(withNulls, Seq.empty, "v")
      .agg(sum("cnt")).as[Long].head() == 2L)
  }

  test("signed error bound: answer == bucketEdge(exact), <= exact, within 10^(1-digits) of |exact|") {
    val rnd = new scala.util.Random(29L)
    val vs = corpus(31L, 1500).map(v => if (rnd.nextBoolean()) v else -v)
    val sk = LogQuantileSketch.sketch(vs.toDF("v"), Seq.empty, "v", 2)
    val qspec = Seq((1, 10), (1, 4), (1, 2), (3, 4), (9, 10))
    val got = LogQuantileSketch.quantiles(sk, Seq.empty, qspec)
      .select("q_1_10", "q_1_4", "q_1_2", "q_3_4", "q_9_10")
      .as[(Long, Long, Long, Long, Long)].head()
    for (((num, den), ans) <- qspec.zip(
        Seq(got._1, got._2, got._3, got._4, got._5))) {
      val exact = exactLower(vs, num, den)
      assert(ans == LogQuantileSketch.edgeOf(exact, 2),
        s"q=$num/$den: $ans vs exact $exact")
      assert(ans <= exact, s"q=$num/$den")
      assert(exact - ans <= math.abs(exact) / 10,
        s"q=$num/$den: $ans vs $exact")
    }
    // column expression agrees with the driver twin on every signed value,
    // including the clamped deepest-negative bucket
    val extremes = Seq(-Long.MaxValue, -9200000000000000005L,
      -9123372036854775807L, Long.MaxValue)
    val all = vs ++ extremes
    val viaCol = LogQuantileSketch.sketch(all.toDF("v"), Seq.empty, "v", 2)
      .orderBy("edge").as[(Long, Long)].collect().toSeq
    val viaRef = all.groupBy(LogQuantileSketch.edgeOf(_, 2)).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(viaCol == viaRef)
    assert(LogQuantileSketch.edgeOf(-9200000000000000005L, 2) == Long.MinValue)
    // signed-line state bound: 2·maxBuckets + 1
    assert(viaCol.size <= 2 * LogQuantileSketch.maxBuckets(2) + 1)
  }

  test("all-zero-weight group reads NULL quantiles (empty-sketch semantics)") {
    val df = Seq(("a", 5L, 0L), ("a", 7L, 0L), ("b", 5L, 2L)).toDF("g", "v", "w")
    val sk = LogQuantileSketch.sketch(df, Seq("g"), "v", 2, weightCol = Some("w"))
    val got = LogQuantileSketch.quantiles(sk, Seq("g"), Seq((1, 2)))
      .orderBy("g").select("g", "n", "q_1_2")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("a", 0L, None), ("b", 2L, Some(5L))))
  }

  test("group total × den past Int64 raises eagerly, not as a generic overflow") {
    val df = Seq((1L, Long.MaxValue / 2), (2L, Long.MaxValue / 2)).toDF("v", "w")
    val sk = LogQuantileSketch.sketch(df, Seq.empty, "v", 2, weightCol = Some("w"))
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val e = intercept[Exception](
      LogQuantileSketch.quantiles(sk, Seq.empty, Seq((1, 4))).collect())
    assert(m(e).contains("overflows Int64"), m(e))
  }

  test("validation: digits range, columns, den bound") {
    val df = Seq((1L, "a")).toDF("v", "g")
    intercept[IllegalArgumentException](
      LogQuantileSketch.sketch(df, Seq.empty, "v", digits = 0))
    intercept[IllegalArgumentException](
      LogQuantileSketch.sketch(df, Seq.empty, "v", digits = 5))
    intercept[IllegalArgumentException](
      LogQuantileSketch.sketch(df, Seq.empty, "nope"))
    intercept[IllegalArgumentException](
      LogQuantileSketch.sketch(df.withColumn("d", lit(1.0)), Seq.empty, "d"))
    val sk = LogQuantileSketch.sketch(df, Seq("g"), "v")
    intercept[IllegalArgumentException](
      LogQuantileSketch.quantiles(sk, Seq("g"), Seq((3, 2))))
    intercept[IllegalArgumentException](
      LogQuantileSketch.quantiles(sk, Seq("g"), Seq((1, 2000000))))
    intercept[IllegalArgumentException](
      LogQuantileSketch.quantiles(sk, Seq("g"), Seq.empty))
  }
}

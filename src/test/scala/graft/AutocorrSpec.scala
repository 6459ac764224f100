package graft

import org.apache.spark.sql.functions._

import graft.operators.Autocorr

/** The exact-rational ACF's contracts: matches a driver-side
  * double-precision reference computation on planted series, reads the
  * right signatures on structured signals (alternating series → acf(1)
  * ≈ −1; linear trend → slowly decaying positives; period-3 cycle →
  * peak at lag 3), NULLs where undefined, RAISES on duplicate t, and
  * plans one PARTITIONED window + one aggregation. */
class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference (plain doubles — exact enough to pin the
    * rational read to 1e-9 on small integer series). */
  private def refAcf(xs: Seq[Long], maxLag: Int): Seq[Option[Double]] = {
    val n = xs.size
    val mu = xs.sum.toDouble / n
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    (1 to maxLag).map { l =>
      if (den == 0.0 || n <= l) None
      else Some((0 until n - l).map(t =>
        (xs(t) - mu) * (xs(t + l) - mu)).sum / den)
    }
  }

  private def runAcf(xs: Seq[Long], maxLag: Int): Seq[Option[Double]] = {
    val df = xs.zipWithIndex.map { case (x, t) => ("s", t.toLong, x) }
      .toDF("g", "t", "x")
    Autocorr.acf(df, Seq("g"), "t", "x", maxLag)
      .collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      .toSeq
  }

  test("matches the driver-side reference on planted series") {
    val rng = new scala.util.Random(7)
    val noisy = (1 to 200).map(_ => rng.nextInt(1000).toLong)
    val trend = (1 to 100).map(i => 10L * i + rng.nextInt(50))
    for (xs <- Seq(noisy, trend)) {
      val got = runAcf(xs, 7)
      val ref = refAcf(xs, 7)
      got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
        assert(g.isDefined == r.isDefined, s"lag ${i + 1}")
        for (gv <- g; rv <- r)
          assert(math.abs(gv - rv) < 1e-9, s"lag ${i + 1}: $gv vs $rv")
      }
    }
  }

  test("signatures: alternating ~ -1 at lag 1; period-3 cycle peaks at lag 3") {
    val alt = (1 to 100).map(i => if (i % 2 == 0) 100L else -100L)
    val a = runAcf(alt, 2)
    assert(a(0).get < -0.9 && a(1).get > 0.9, s"alternating: $a")
    val cyc = (1 to 99).map(i => Seq(0L, 500L, 1000L)(i % 3))
    val c = runAcf(cyc, 3)
    assert(c(2).get > 0.9 && c(2).get > c(0).get && c(2).get > c(1).get,
      s"cycle: $c")
  }

  test("undefined reads are NULL: constant series, lags past the length") {
    val const = runAcf(Seq.fill(10)(42L), 3)
    assert(const.forall(_.isEmpty), s"constant: $const")
    val short = runAcf(Seq(1L, 5L, 2L), 5) // n = 3: lags 3.. have no pairs
    assert(short.take(2).forall(_.isDefined) && short.drop(2).forall(_.isEmpty),
      s"short: $short")
  }

  test("duplicate t RAISES; non-BIGINT x and bad maxLag rejected") {
    val dup = Seq(("s", 1L, 10L), ("s", 1L, 20L), ("s", 2L, 30L))
      .toDF("g", "t", "x")
    intercept[Exception](Autocorr.acf(dup, Seq("g"), "t", "x", 2).collect())
    val dbl = Seq(("s", 1L, 1.5)).toDF("g", "t", "x")
    intercept[IllegalArgumentException](Autocorr.acf(dbl, Seq("g"), "t", "x", 2))
    val ok = Seq(("s", 1L, 1L)).toDF("g", "t", "x")
    intercept[IllegalArgumentException](Autocorr.acf(ok, Seq("g"), "t", "x", 0))
  }

  /** Driver-side CCF reference (plain doubles). */
  private def refCcf(xs: Seq[Long], ys: Seq[Long],
                     maxLag: Int): Seq[Option[Double]] = {
    val n = xs.size
    val mx = xs.sum.toDouble / n; val my = ys.sum.toDouble / n
    val dx = xs.map(x => (x - mx) * (x - mx)).sum
    val dy = ys.map(y => (y - my) * (y - my)).sum
    (-maxLag to maxLag).map { l =>
      if (dx == 0.0 || dy == 0.0 || n <= math.abs(l)) None
      else {
        val num =
          if (l >= 0) (0 until n - l).map(t =>
            (xs(t) - mx) * (ys(t + l) - my)).sum
          else (0 until n + l).map(t =>
            (xs(t - l) - mx) * (ys(t) - my)).sum
        Some(num / math.sqrt(dx * dy))
      }
    }
  }

  private def runCcf(xs: Seq[Long], ys: Seq[Long],
                     maxLag: Int): Seq[Option[Double]] = {
    val df = xs.zip(ys).zipWithIndex.map { case ((x, y), t) =>
      ("s", t.toLong, x, y) }.toDF("g", "t", "x", "y")
    Autocorr.ccf(df, Seq("g"), "t", "x", "y", maxLag)
      .collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
      .toSeq
  }

  test("ccf matches the driver-side reference; lag 0 is Pearson; shifted copy peaks at its shift") {
    val rng = new scala.util.Random(13)
    val xs = (1 to 150).map(_ => rng.nextInt(1000).toLong)
    val ys = (1 to 150).map(_ => rng.nextInt(1000).toLong)
    runCcf(xs, ys, 4).zip(refCcf(xs, ys, 4)).zipWithIndex.foreach {
      case ((g, r), i) =>
        assert(g.isDefined == r.isDefined, s"idx $i")
        for (gv <- g; rv <- r)
          assert(math.abs(gv - rv) < 1e-9, s"idx $i: $gv vs $rv")
    }
    // y delayed: y_t = full(t), x_t = full(t+3) -> x_t == y_{t+3}, so
    // the CCF peaks at lag +3 near 1 (x LEADS y by 3)
    val full = (1 to 103).map(_ => rng.nextInt(1000).toLong)
    val c = runCcf(full.drop(3), full.dropRight(3), 5)
    val peak = c(5 + 3) // index maxLag + lag
    assert(peak.get > 0.95, s"shifted-copy peak: $c")
    assert(c.zipWithIndex.filter(_._2 != 8).forall(_._1.get < peak.get))
  }

  test("ccf symmetry: ccf(x,y)(+l) == ccf(y,x)(-l); sign flips under y -> c - y; constant series NULL") {
    val rng = new scala.util.Random(17)
    val xs = (1 to 80).map(_ => rng.nextInt(500).toLong)
    val ys = (1 to 80).map(_ => rng.nextInt(500).toLong)
    val ab = runCcf(xs, ys, 3)
    val ba = runCcf(ys, xs, 3)
    ab.zip(ba.reverse).foreach { case (p, q) =>
      assert(math.abs(p.get - q.get) < 1e-12) }
    val neg = runCcf(xs, ys.map(1000L - _), 3)
    ab.zip(neg).foreach { case (p, q) =>
      assert(math.abs(p.get + q.get) < 1e-12) }
    assert(runCcf(xs, Seq.fill(80)(7L), 3).forall(_.isEmpty))
  }

  test("ccf guards: duplicate t RAISES; non-BIGINT y rejected; plan has no lag join") {
    val dup = Seq(("g", 1L, 1L, 1L), ("g", 1L, 2L, 2L), ("g", 2L, 3L, 3L))
      .toDF("g", "t", "x", "y")
    val e = intercept[Exception](
      Autocorr.ccf(dup, Seq("g"), "t", "x", "y", 2).collect())
    assert(e.getMessage.contains("duplicate"))
    val bad = Seq(("g", 1L, 1L, 1.5)).toDF("g", "t", "x", "y")
    intercept[IllegalArgumentException](
      Autocorr.ccf(bad, Seq("g"), "t", "x", "y", 2))
    val ok = Seq(("g", 1L, 1L, 1L), ("g", 2L, 2L, 2L)).toDF("g", "t", "x", "y")
    intercept[IllegalArgumentException](
      Autocorr.ccf(ok, Seq("g"), "t", "x", "x", 2))
    val plan = Autocorr.ccf(ok, Seq("g"), "t", "x", "y", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "ccf should not join")
  }

  test("independent series stay independent; plan is a partitioned window, no join") {
    val df = ((1 to 50).map(i => ("a", i.toLong, i.toLong)) ++
      (1 to 50).map(i => ("b", i.toLong, (51 - i).toLong))).toDF("g", "t", "x")
    val out = Autocorr.acf(df, Seq("g"), "t", "x", 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "acf should not join")
    val rows = out.collect()
    assert(rows.length == 4)
    // a ascending and b descending have IDENTICAL acf (lag products are
    // invariant under x -> c - x)
    val byG = rows.groupBy(_.getString(0)).map { case (g, rs) =>
      g -> rs.map(_.getDouble(3)).toSeq
    }
    assert(byG("a").zip(byG("b")).forall { case (x, y) =>
      math.abs(x - y) < 1e-12 })
  }
}

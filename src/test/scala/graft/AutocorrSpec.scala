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

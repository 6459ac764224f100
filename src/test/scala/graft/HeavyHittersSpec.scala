package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Exact heavy hitters via mergeable Misra-Gries + candidate recount
  * (q72): exactness vs the full group-by on adversarial corpora, and the
  * bounded-memory property that is the operator's reason to exist. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(docs: org.apache.spark.sql.DataFrame, den: Long) = {
    val terms = docs.select(explode(split(col("text"), " ")).as("term"))
    val n = terms.count()
    val minCount = math.max(1L, n / den)
    terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy("term")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
  }

  test("matches the exact full group-by on a long-tailed corpus, several thresholds") {
    val rnd = new scala.util.Random(72)
    // few heavy terms + a long tail of near-singletons — the regime where
    // MG's bounded candidate set does its work
    val heavy = Vector("alpha", "beta", "gamma")
    val rows = (1L to 400L).map { i =>
      val ws = Seq.fill(20)(
        if (rnd.nextInt(100) < 60) heavy(rnd.nextInt(3))
        else s"rare${rnd.nextInt(3000)}")
      i -> ws.mkString(" ")
    }
    val docs = rows.toDF("doc_id", "text")
    for (den <- Seq(4L, 16L, 64L, 1000L)) {
      val got = HeavyHitters.frequentTerms(docs, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toList
      assert(got == exact(docs, den), s"mismatch at den=$den")
    }
    // the MG CANDIDATE set varies with partitioning; the exact recount
    // must erase that — output is partition-invariant
    val a = HeavyHitters.frequentTerms(docs, 16L).collect().map(_.toSeq).toList
    val b = HeavyHitters.frequentTerms(docs.repartition(7), 16L).collect().map(_.toSeq).toList
    assert(a == b, "heavy-hitter output changed with partitioning")
  }

  test("summary never exceeds k counters while streaming a huge vocabulary") {
    val s = new HeavyHitters.Summary(10)
    val rnd = new scala.util.Random(720)
    (1 to 100000).foreach { _ =>
      s.add(if (rnd.nextInt(10) == 0) "heavy" else s"t${rnd.nextInt(50000)}")
      assert(s.counts.size <= 10)
    }
    // the 1-in-10 term holds ~10% > n/(k+1) of the stream: MG must keep it
    assert(s.counts.contains("heavy"))
    assert(s.n == 100000L)
  }

  test("merged summaries keep every term above the additive error bound") {
    val rnd = new scala.util.Random(721)
    val k = 20
    val parts = (1 to 8).map { p =>
      val s = new HeavyHitters.Summary(k)
      (1 to 5000).foreach { _ =>
        s.add(if (rnd.nextInt(5) == 0) "dominant" else s"p${p}t${rnd.nextInt(2000)}")
      }
      s
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    assert(merged.counts.size <= k)
    assert(merged.n == 40000L)
    // "dominant" holds ~20% of the stream, far above N/k = 5% error
    assert(merged.counts.contains("dominant"))
    // MG counters only UNDERcount
    assert(merged.counts("dominant") <= 40000L / 4)
  }

  test("NULL text, empty corpus, and den=1 degenerate cases") {
    val withNull = Seq((1L, "a a b"), (2L, null)).toDF("doc_id", "text")
    val got = HeavyHitters.frequentTerms(withNull, den = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    // 3 tokens, minCount = 1: both terms qualify
    assert(got == List("a" -> 2L, "b" -> 1L))

    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(HeavyHitters.frequentTerms(empty, den = 64).count() == 0)

    // den=1: minCount = N, only a term holding the ENTIRE corpus qualifies
    val mono = Seq((1L, "x x"), (2L, "x x")).toDF("doc_id", "text")
    val all = HeavyHitters.frequentTerms(mono, den = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(all == List("x" -> 4L))
  }

  test("falls back to the exact group-by when the realized undercount reaches minCount") {
    // 12 distinct singletons, den=8 (k=9 counters): n=12 < 2·den so
    // minCount = 1, and the summary necessarily loses ≥3 singletons (12 > k) — the
    // a-priori MG bound cannot certify completeness here. The realized-
    // undercount guard must detect dec >= minCount and take the exact
    // full group-by, so ALL 12 terms come back with cnt 1.
    val docs = (1L to 12L).map(i => (i, s"w$i")).toDF("doc_id", "text")
    val df = HeavyHitters.frequentTerms(docs, den = 8)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toList
    assert(got == exact(docs, 8), "fallback did not restore exactness")
    assert(got.size == 12, s"lost singletons: ${got.size}/12")
    // telemetry: the frame must SAY the expensive path ran, with the
    // certificate inputs that forced it
    val (path, dec, n, minCount) = HeavyHitters.pathTaken(df)
    assert(path == "exact-fallback", s"fallback ran unreported: $path")
    assert(n == 12L && minCount == 1L && dec >= minCount,
      s"certificate inputs wrong: dec=$dec n=$n minCount=$minCount")
  }

  test("telemetry reports the sketch-recount path when the certificate holds") {
    // heavy corpus: one term dominates hard enough that minCount stays
    // above any realized dec (each tree-merge can subtract at most 1
    // here — cold terms are singletons — and there are ≤ 7 data-bearing
    // merges, far under minCount = 22)
    val docs = (1L to 8L).map(i => (i, ("hot " * 10) + "cold" + i))
      .toDF("doc_id", "text")
    val df = HeavyHitters.frequentTerms(docs, den = 4)
    val (path, dec, n, minCount) = HeavyHitters.pathTaken(df)
    assert(path == "sketch-recount", s"expected the cheap path: $path")
    assert(n == 88L && minCount == 22L && dec < minCount,
      s"certificate inputs wrong: dec=$dec n=$n minCount=$minCount")
    assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toList ==
      List("hot" -> 80L))
  }

  test("Summary tracks the realized undercount through adds and merges") {
    val s = new HeavyHitters.Summary(2)
    Seq("a", "b", "c").foreach(s.add) // third distinct triggers decrement-all
    assert(s.dec == 1L)
    val t = new HeavyHitters.Summary(2)
    Seq("x", "y").foreach(t.add)
    assert(t.dec == 0L)
    // merge: 2+2 surviving counters > k=2 → subtraction adds to dec;
    // merged dec >= both inputs' decs summed
    val m = s.merge(t)
    assert(m.dec >= 1L && m.n == 5L)
  }

  test("den outside the driver-memory bound is rejected") {
    val d = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](HeavyHitters.frequentTerms(d, 0L))
    intercept[IllegalArgumentException](HeavyHitters.frequentTerms(d, 5000000L))
  }
}

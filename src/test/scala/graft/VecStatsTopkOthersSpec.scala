package graft

import org.apache.spark.sql.functions._

import graft.embed.VecStats
import graft.operators.TableOps

/** [[VecStats.perDimStats]] and [[TableOps.topKWithOthers]]. */
class VecStatsTopkOthersSpec extends SparkSpec {
  import spark.implicits._

  // ── perDimStats ───────────────────────────────────────────────────────

  test("property: quantized stats match brute force") {
    val rnd = new scala.util.Random(83)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(4)(rnd.nextFloat() * 2 - 1)))
    val got = VecStats.perDimStats(vecs.toDF("vec_id", "embedding"),
      "embedding", dim = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 4)
    got.foreach { case (d, n, sq, ssq, mn, mx) =>
      val qs = vecs.map(v => math.floor(v._2(d.toInt).toDouble * 1e6).toLong)
      assert(n == 50L && sq == qs.sum && ssq == qs.map(q => q * q).sum)
      assert(mn == qs.min && mx == qs.max)
    }
  }

  test("a dead dimension shows min_q = max_q") {
    val vecs = Seq((1L, Array(0.5f, 0.0f)), (2L, Array(0.7f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = VecStats.perDimStats(vecs, "embedding", 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._5 == 0L && got(1L)._6 == 0L)
    assert(got(0L)._5 != got(0L)._6)
  }

  test("ragged vectors raise; NULL vectors are excluded") {
    val bad = Seq((1L, Array(0.1f, 0.2f)), (2L, Array(0.3f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](
      VecStats.perDimStats(bad, "embedding", 2).collect())
    assert(e.getMessage.contains("dims") ||
      (e.getCause != null && e.getCause.getMessage.contains("dims")))
    val withNull = Seq((1L, Some(Array(0.1f, 0.2f))), (2L, None))
      .toDF("vec_id", "embedding")
    assert(VecStats.perDimStats(withNull, "embedding", 2)
      .agg(max("n")).head.getLong(0) == 1L)
  }

  // ── topKWithOthers ────────────────────────────────────────────────────

  test("top-k keep identity, the tail rolls up, totals reconcile") {
    val rows = Seq(
      ("g", "a", 50L), ("g", "b", 30L), ("g", "c", 10L), ("g", "d", 7L),
      ("g", "e", 3L), ("h", "a", 5L))
    val got = TableOps.topKWithOthers(rows.toDF("g", "i", "x"),
      "g", "i", "x", k = 2)
      .as[(String, String, Long, Long, Long)].collect()
    val gRows = got.filter(_._1 == "g")
    assert(gRows.toSeq == Seq(("g", "a", 50L, 1L, 1L),
      ("g", "b", 30L, 1L, 2L), ("g", "<OTHERS>", 20L, 3L, 3L)))
    // group with ≤ k items has no OTHERS row
    assert(got.filter(_._1 == "h").toSeq == Seq(("h", "a", 5L, 1L, 1L)))
    // totals reconcile
    assert(gRows.map(_._3).sum == 100L)
  }

  test("ties rank deterministically by item name") {
    val rows = Seq(("g", "z", 10L), ("g", "a", 10L), ("g", "m", 10L))
    val got = TableOps.topKWithOthers(rows.toDF("g", "i", "x"),
      "g", "i", "x", k = 2).as[(String, String, Long, Long, Long)].collect()
    assert(got.map(_._2).toSeq == Seq("a", "m", "<OTHERS>"))
  }

  test("reserved label collision and bad k raise") {
    val df = Seq(("g", "<OTHERS>", 1L)).toDF("g", "i", "x")
    intercept[IllegalArgumentException](
      TableOps.topKWithOthers(df, "g", "i", "x", 2))
    val ok = Seq(("g", "a", 1L)).toDF("g", "i", "x")
    intercept[IllegalArgumentException](
      TableOps.topKWithOthers(ok, "g", "i", "x", 0))
  }
}

package graft

import graft.text.Retrieval

/** RRF fusion: exact integer point arithmetic, hand-checked. */
class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L
  private def pts(rank: Long, rrfK: Long = 60L): Long = S / (rrfK + rank)

  private def run(rows: Seq[(String, Long, Int)], k: Int): Map[(String, Long), (Long, Int)] =
    Retrieval.rrfFuse(rows.toDF("q", "doc", "rank"), "q", "doc", "rank", k)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getInt(3))).toMap

  test("hand example: agreement outranks a single first place") {
    // doc 1 is rank 2 in BOTH runs; doc 2 is rank 1 in one run only.
    // 2·(1e9 div 62) = 32258064 > 1e9 div 61 = 16393442
    val rows = Seq(("q", 1L, 2), ("q", 2L, 1), ("q", 1L, 2))
    val got = run(rows, 10)
    assert(got((("q", 1L))) == (2 * pts(2), 1))
    assert(got((("q", 2L))) == (pts(1), 2))
  }

  test("ties on score break by doc id; k truncates") {
    // docs 7 and 3 both rank 1 once: same score, doc 3 wins the tie
    val rows = Seq(("q", 7L, 1), ("q", 3L, 1), ("q", 9L, 2))
    val got = run(rows, 2)
    assert(got((("q", 3L)))._2 == 1 && got((("q", 7L)))._2 == 2)
    assert(!got.contains(("q", 9L)), "k=2 must drop the third doc")
  }

  test("queries fuse independently") {
    val rows = Seq(("a", 1L, 1), ("b", 1L, 5), ("b", 2L, 1))
    val got = run(rows, 10)
    assert(got((("a", 1L)))._2 == 1)
    assert(got((("b", 2L)))._2 == 1 && got((("b", 1L)))._2 == 2)
  }

  test("a 0-based or NULL rank raises instead of silently dominating") {
    intercept[Exception] { run(Seq(("q", 1L, 0)), 10) }
    intercept[Exception] {
      Retrieval.rrfFuse(
        Seq(("q", 1L, Option.empty[Int])).toDF("q", "doc", "rank"),
        "q", "doc", "rank", 10).collect()
    }
  }

  test("parameters are validated") {
    val df = Seq(("q", 1L, 1)).toDF("q", "doc", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(df, "q", "doc", "rank", 0) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(df, "q", "q", "rank", 1) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(df, "q", "doc", "rank", 1, rrfK = -1) }
  }

  test("matches a plain-Scala fold on random runs") {
    val rng = new scala.util.Random(31L)
    val rows = for {
      q <- Seq("a", "b", "c"); runId <- 1 to 3
      (doc, i) <- rng.shuffle((1L to 20L).toList).take(10).zipWithIndex
    } yield (q, doc, i + 1)
    val expect = rows.groupBy(r => (r._1, r._2))
      .map { case (k, v) => k -> v.map(r => pts(r._3.toLong)).sum }
    val got = run(rows, 1000)
    assert(got.view.mapValues(_._1).toMap == expect)
    // fused_rank is the dense 1..n order of (score desc, doc) per query
    for (q <- Seq("a", "b", "c")) {
      val perQ = got.collect { case ((`q`, d), (s, r)) => (r, (-s, d)) }.toSeq.sortBy(_._1)
      assert(perQ.map(_._1) == (1 to perQ.size), s"ranks not dense for $q")
      assert(perQ.map(_._2) == perQ.map(_._2).sorted, s"rank order wrong for $q")
    }
  }
}

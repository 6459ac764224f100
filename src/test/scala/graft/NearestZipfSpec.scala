package graft

import graft.operators.Spatial
import graft.text.Ngrams

/** [[Spatial.nearestNeighbor]] and [[Ngrams.zipfProfile]]. */
class NearestZipfSpec extends SparkSpec {
  import spark.implicits._

  // ── nearestNeighbor ───────────────────────────────────────────────────

  test("property: argmin matches brute force with the smaller-id tiebreak") {
    val rnd = new scala.util.Random(199)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(1500).toLong, rnd.nextInt(1500).toLong))
    val got = Spatial.nearestNeighbor(pts.toDF("id", "x", "y"),
      "id", "x", "y", radius = 200L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = pts.flatMap { a =>
      val cands = pts.filter(b => b._1 != a._1)
        .map(b => (b._1,
          (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)))
        .filter(_._2 <= 200L * 200L)
      if (cands.isEmpty) None
      else Some(a._1 -> {
        val best = cands.map(c => (c._2, c._1)).min
        (best._2, best._1)
      })
    }.toMap
    assert(got == want)
  }

  test("coincident points pick each other at distance 0, smaller id first") {
    val pts = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 5L))
    val got = Spatial.nearestNeighbor(pts.toDF("id", "x", "y"),
      "id", "x", "y", 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("an isolated point is omitted") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 1000L, 1000L))
    val got = Spatial.nearestNeighbor(pts.toDF("id", "x", "y"),
      "id", "x", "y", 10L).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  // ── zipfProfile ───────────────────────────────────────────────────────

  test("buckets follow floor(log2(rank)) with exact per-bucket stats") {
    // frequencies 8,4,4,2,1,1,1 → ranks 1..7 → buckets 0,1,1,2,2,2,2
    val docs = Seq(
      (1L, "a a a a b b c c d"),
      (2L, "a a a a b b e f g")).toDF("doc_id", "text")
    val got = Ngrams.zipfProfile(docs, minCount = 1L).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // counts: a=8, b=4, c=2, d=1, e=1, f=1, g=1 → ranks 1..7
    assert(got(0L) == ((1L, 8L, 8L, 8L)))
    assert(got(1L) == ((2L, 6L, 2L, 4L)))
    assert(got(2L) == ((4L, 4L, 1L, 1L)))
    assert(got.size == 3)
  }

  test("minCount prunes the tail before ranking") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val got = Ngrams.zipfProfile(docs, minCount = 2L).collect()
    assert(got.length == 1 && got.head.getLong(0) == 0L
      && got.head.getLong(1) == 1L)
  }
}

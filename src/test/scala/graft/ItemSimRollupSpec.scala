package graft

import org.apache.spark.sql.functions._

import graft.graph.Hierarchy
import graft.operators.Association

/** [[Association.itemSimilarity]] and [[Hierarchy.rollupSum]]. */
class ItemSimRollupSpec extends SparkSpec {
  import spark.implicits._

  // ── itemSimilarity ────────────────────────────────────────────────────

  test("property: scores and ranks match the brute-force model") {
    val rnd = new scala.util.Random(193)
    val rows = (1L to 600L).map(i => (rnd.nextInt(80).toLong,
      rnd.nextInt(25).toLong))
    val got = Association.itemSimilarity(rows.toDF("bk", "item"),
      "bk", "item", minSupport = 2L, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(6)) -> (r.getLong(1), r.getLong(5)))
      .toMap
    val b = rows.distinct
    val cnt = b.groupBy(_._2).map { case (i, rs) => i -> rs.size.toLong }
    val co = (for {
      (bk1, i1) <- b; (bk2, i2) <- b
      if bk1 == bk2 && i1 < i2
    } yield (i1, i2)).groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .filter { case ((a, c), n) => n >= 2 && cnt(a) >= 2 && cnt(c) >= 2 }
    val sym = co.toSeq.flatMap { case ((a, c), n) =>
      Seq((a, c, n, cnt(a), cnt(c)), (c, a, n, cnt(c), cnt(a)))
    }
    for ((item, neigh) <- sym.groupBy(_._1)) {
      val want = neigh.map { case (_, o, n, ci, co2) =>
        (o, (((n * 1000000L) / ci) * n) / co2)
      }.sortBy { case (o, s) => (-s, o) }.take(3)
      want.zipWithIndex.foreach { case ((o, s), idx) =>
        assert(got((item, idx + 1L)) == ((o, s)), s"item $item rank ${idx + 1}")
      }
    }
  }

  test("symmetry: sim(a,b) as seen from a equals from b") {
    val df = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L))
      .toDF("bk", "item")
    val got = Association.itemSimilarity(df, "bk", "item", 2L, 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
    // cnt(10)=3, cnt(11)=2, co=2: from 10 → (2*1e6 div 3)*2 div 2 = 666666
    // from 11 → (2*1e6 div 2)*2 div 3 = 666666 (nested form agrees here)
    assert(got(10L) == ((11L, 666666L)))
    assert(got(11L) == ((10L, 666666L)))
  }

  test("items below support never appear, even as neighbors") {
    val df = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (1L, 99L))
      .toDF("bk", "item")
    val items = Association.itemSimilarity(df, "bk", "item", 2L, 5).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(!items.contains(99L))
  }

  // ── rollupSum ─────────────────────────────────────────────────────────

  test("chain: totals accumulate up every ancestor; self included") {
    // 4 → 3 → 2; facts at 4, 3 and at orphan 9
    val edges = Seq((4L, 3L), (3L, 2L)).toDF("c", "p")
    val facts = Seq((4L, 10L), (4L, 5L), (3L, 100L), (9L, 7L)).toDF("k", "v")
    val got = Hierarchy.rollupSum(edges, "c", "p", 4, facts, "k", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(4L) == ((2L, 15L)))
    assert(got(3L) == ((3L, 115L)))
    assert(got(2L) == ((3L, 115L)))
    assert(got(9L) == ((1L, 7L)), "orphan fact key rolls up to itself")
    assert(got.size == 4)
  }

  test("diamond DAG counts each fact once per ancestor") {
    // 1 → {2, 3} → 4: facts at 1 reach 4 exactly once
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("c", "p")
    val facts = Seq((1L, 10L)).toDF("k", "v")
    val got = Hierarchy.rollupSum(edges, "c", "p", 4, facts, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 10L))
  }

  test("maxDepth truncates the closure") {
    val edges = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("c", "p")
    val facts = Seq((4L, 1L)).toDF("k", "v")
    val got = Hierarchy.rollupSum(edges, "c", "p", 2, facts, "k", "v")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(4L, 3L, 2L), "depth-3 ancestor 1 must be cut off")
  }

  test("two-level tree: each parent holds exactly its children's sum") {
    val edges = (10L to 99L).map(c => (c, c / 10)).toDF("c", "p")
    val facts = (10L to 99L).map(k => (k, k)).toDF("k", "v")
    val got = Hierarchy.rollupSum(edges, "c", "p", 4, facts, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    for (p <- 1L to 9L)
      assert(got(p) == (p * 10 to p * 10 + 9).sum, s"parent $p")
    assert(got(55L) == 55L, "leaf holds only its own fact")
  }
}

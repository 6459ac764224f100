package graft

import graft.graph.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, peels: Int): Map[Long, Long] =
    KCore.kCore(edges.toDF("x", "y"), "x", "y", k, peels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // plain-Scala peeler, same bounded semantics
  private def ref(edges: Seq[(Long, Long)], k: Int, peels: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).distinct
    var rounds = 0
    var changed = true
    while (changed && rounds < peels) {
      val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
        .map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2.size != e.size
      e = e2
      rounds += 1
    }
    (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
  }

  test("matches the reference peeler on random graphs, bounded and converged") {
    val rng = new scala.util.Random(23L)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 5
      val edges = Seq.fill(n * 3)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      for (k <- Seq(2, 3); peels <- Seq(1, 2, 50)) {
        assert(run(edges, k, peels) == ref(edges, k, peels),
          s"trial=$trial k=$k peels=$peels")
      }
    }
  }

  test("K5 is its own 4-core; a chain has an empty 2-core") {
    val k5 = for (a <- 0L until 5L; b <- 0L until 5L if a < b) yield (a, b)
    assert(run(k5, 4, 10) == (0L until 5L).map(_ -> 4L).toMap)
    val chain = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq
    assert(run(chain, 2, 10).isEmpty)
  }

  test("peeling cascades: a pendant tail peels off round by round") {
    // triangle 0-1-2 with tail 2-3-4: round 1 drops node 4, round 2
    // drops node 3; the 2-core is the triangle alone
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
    assert(run(g, 2, 1).keySet == Set(0L, 1L, 2L, 3L)) // one peel: 4 gone
    assert(run(g, 2, 10) == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("rejects bad parameters") {
    val e = Seq((1L, 2L)).toDF("x", "y")
    intercept[IllegalArgumentException](KCore.kCore(e, "x", "y", 0, 1))
    intercept[IllegalArgumentException](KCore.kCore(e, "x", "y", 1, 0))
  }
}

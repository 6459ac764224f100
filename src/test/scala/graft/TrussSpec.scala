package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.graph.Truss

/** k-truss vs a plain-Scala peel loop — same recount-per-round
  * semantics, exact. */
class TrussSpec extends SparkSpec {
  import spark.implicits._

  private def ref(edges: Seq[(Long, Long)], k: Int, peels: Int): Set[(Long, Long)] = {
    var e = edges.map { case (a, b) => (a min b, a max b) }
      .filter(p => p._1 != p._2).distinct.toSet
    var rounds = 0
    var changed = true
    while (rounds < peels && changed && e.nonEmpty) {
      // support(a,b) = third vertices adjacent to both endpoints
      val adj = (e ++ e.map(_.swap)).groupBy(_._1)
        .map { case (n, v) => n -> v.map(_._2).toSet }.withDefaultValue(Set.empty[Long])
      val kept = e.filter { case (a, b) => (adj(a) & adj(b)).size >= k - 2 }
      rounds += 1
      changed = kept != e
      e = kept
    }
    e
  }

  private def run(edges: Seq[(Long, Long)], k: Int, peels: Int,
                  rounds: Option[AtomicInteger] = None): Set[(Long, Long)] =
    Truss.kTruss(edges.toDF("a", "b"), "a", "b", k, peels, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))

  test("K4 is a 4-truss; a lone triangle is not") {
    assert(run(k4, 4, 5) == k4.toSet)
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 4, 5).isEmpty)
    // but the triangle IS a 3-truss
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 3, 5)
      == Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("peeling recounts support: a pendant triangle falls off K4") {
    // K4 plus triangle (1,2,5): edges (1,5),(2,5) have support 1 → peel;
    // (1,2) drops from support 3 to 2 but stays — the recount matters
    val g = k4 ++ Seq((1L, 5L), (2L, 5L))
    val rounds = new AtomicInteger(-1)
    assert(run(g, 4, 5, Some(rounds)) == k4.toSet)
    assert(rounds.get == 2, s"expected peel + no-op proof, ran ${rounds.get}")
  }

  test("cascading collapse needs multiple peels and maxPeels truncates honestly") {
    // two triangles sharing edge (2,3): round 1 peels the four outer
    // edges, round 2 peels (2,3) whose support collapsed to 0
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(g, 4, 5).isEmpty)
    // bounded at 1 peel: the documented 1-round approximant
    assert(run(g, 4, 1) == Set((2L, 3L)))
  }

  test("matches the reference peel loop on random graphs") {
    val rng = new scala.util.Random(89L)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 3
      val edges = Seq.fill(n * 4)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      for (k <- Seq(3, 4, 5); peels <- Seq(1, 4))
        assert(run(edges, k, peels) == ref(edges, k, peels),
          s"trial=$trial k=$k peels=$peels")
    }
  }

  test("parameters are validated") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] { Truss.kTruss(e, "a", "b", 2, 5) }
    intercept[IllegalArgumentException] { Truss.kTruss(e, "a", "b", 4, 0) }
  }
}

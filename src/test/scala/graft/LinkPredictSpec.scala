package graft

import graft.graph.LinkPredict

/** Link prediction vs a plain-Scala set-algebra reference over the
  * capped-connector semantics — exact, not approximate. */
class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  // reference: capped neighborhoods Ncap(v) = {u ~ v : deg(u) <= cap},
  // every non-adjacent pair with |Ncap(a) ∩ Ncap(b)| >= minCommon
  private def ref(edges: Seq[(Long, Long)], cap: Int, minCommon: Long)
      : Map[(Long, Long), (Long, Long)] = {
    val e = edges.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (e ++ e.map(_.swap)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val deg = adj.map { case (k, v) => k -> v.size }
    val ncap = adj.map { case (k, v) => k -> v.filter(deg(_) <= cap) }
    val nodes = adj.keys.toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && !adj(a).contains(b)
      common = (ncap(a) & ncap(b)).size.toLong if common >= minCommon
    } yield (a, b) -> (common, ncap(a).size + ncap(b).size - common))
      .toMap.map { case (k, (c, d)) => k -> (c, d.toLong) }
  }

  private def run(edges: Seq[(Long, Long)], cap: Int, minCommon: Long)
      : Map[(Long, Long), (Long, Long)] =
    LinkPredict.commonNeighbors(edges.toDF("a", "b"), "a", "b", cap, minCommon)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap

  test("hand example: path 1–2–3 predicts the closing edge") {
    // one wedge through 2; Ncap(1) = Ncap(3) = {2} so Jaccard = 1/1
    assert(run(Seq((1L, 2L), (2L, 3L)), cap = 10, minCommon = 1L) ==
      Map((1L, 3L) -> (1L, 1L)))
  }

  test("triangle: already-adjacent pairs are never candidates") {
    assert(run(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 10, 1L).isEmpty)
  }

  test("hub guard: a center above maxDegree generates no candidates") {
    // star 0–{1..5}: center degree 5 > cap 4 ⇒ no connectors at all
    val star = (1L to 5L).map(i => (0L, i))
    assert(run(star, cap = 4, minCommon = 1L).isEmpty)
    // at cap 5 the center connects, predicting all leaf pairs with
    // common = 1 and den = 1 (each leaf's capped neighborhood is {0})
    val got = run(star, cap = 5, minCommon = 1L)
    assert(got.size == 10 && got.values.forall(_ == (1L, 1L)))
  }

  test("minCommon filters single-connector pairs") {
    // 1↔4 share connectors {2,3} and 2↔3 share {1,4}; 1↔5 and 4↔5
    // share only connector 2 and are filtered at minCommon = 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (2L, 5L))
    val got = run(edges, 10, minCommon = 2L)
    assert(got.keySet == Set((1L, 4L), (2L, 3L)))
    assert(got((1L, 4L))._1 == 2L && got((2L, 3L))._1 == 2L)
    assert(run(edges, 10, minCommon = 1L).keySet ==
      Set((1L, 4L), (2L, 3L), (1L, 5L), (4L, 5L)))
  }

  test("property: matches the set-algebra reference on random graphs") {
    val rng = new scala.util.Random(23L)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 3)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      for (cap <- Seq(3, 100); mc <- Seq(1L, 2L)) {
        assert(run(edges, cap, mc) == ref(edges, cap, mc),
          s"trial=$trial cap=$cap minCommon=$mc")
      }
    }
  }

  test("duplicate / reversed / self-loop edges are canonicalized away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
    assert(run(messy, 10, 1L) == ref(messy, 10, 1L))
    assert(run(messy, 10, 1L) == Map((1L, 3L) -> (1L, 1L)))
  }

  test("parameters are validated") {
    intercept[IllegalArgumentException] {
      LinkPredict.commonNeighbors(Seq((1L, 2L)).toDF("a", "b"), "a", "b", 0)
    }
    intercept[IllegalArgumentException] {
      LinkPredict.commonNeighbors(Seq((1L, 2L)).toDF("a", "b"), "a", "b", 5, 0L)
    }
  }
}

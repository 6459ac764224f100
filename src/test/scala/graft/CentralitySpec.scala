package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.graph.Centrality

/** Per-seed distances and harmonic centrality vs plain-Scala BFS. */
class CentralitySpec extends SparkSpec {
  import spark.implicits._

  private def refDist(edges: Seq[(Long, Long)], seeds: Set[Long], maxHops: Int)
      : Map[(Long, Long), Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    (for (s <- seeds.toSeq) yield {
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(adj).filterNot(dist.contains)
        dist ++= frontier.map(_ -> h.toLong)
      }
      dist.map { case (n, d) => (s, n) -> d }
    }).flatten.toMap
  }

  private def runDist(edges: Seq[(Long, Long)], seeds: Set[Long], maxHops: Int,
                      rounds: Option[AtomicInteger] = None): Map[(Long, Long), Long] =
    Centrality.perSeedDistances(edges.toDF("a", "b"), "a", "b",
        seeds.toSeq.toDF("n"), "n", maxHops, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("per-seed distances match plain BFS on a random graph") {
    val rng = new scala.util.Random(71L)
    val edges = Seq.fill(120)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    val seeds = Set(0L, 5L, 11L)
    for (h <- Seq(1, 3))
      assert(runDist(edges, seeds, h) == refDist(edges, seeds, h), s"hops=$h")
  }

  test("seeds keep their own per-seed labels (not min-over-any-seed)") {
    // path 1–2–3 with seeds {1, 3}: node 2 is at dist 1 from BOTH —
    // two rows, unlike Bfs.hopDistance's single collapsed label
    val got = runDist(Seq((1L, 2L), (2L, 3L)), Set(1L, 3L), 2)
    assert(got((1L, 2L)) == 1L && got((3L, 2L)) == 1L)
    assert(got((1L, 3L)) == 2L && got((3L, 1L)) == 2L)
  }

  test("exact fixed point stops early once all reachable nodes are labeled") {
    // 3-path from seed 1: everything labeled after 2 rounds; budget 6
    val rounds = new AtomicInteger(-1)
    val got = runDist(Seq((1L, 2L), (2L, 3L)), Set(1L), 6, Some(rounds))
    assert(got == refDist(Seq((1L, 2L), (2L, 3L)), Set(1L), 6))
    assert(rounds.get == 3, s"expected stop at round 3 (2 + the no-op proof), ran ${rounds.get}")
  }

  test("an isolated seed appears at dist 0 and harmonic 0") {
    val got = runDist(Seq((1L, 2L)), Set(99L), 2)
    assert(got == Map((99L, 99L) -> 0L))
    val h = Centrality.harmonicCentrality(Seq((1L, 2L)).toDF("a", "b"),
        "a", "b", Seq(99L).toDF("n"), "n", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(h.toSeq == Seq((99L, 0L, 0L, 6L)))
  }

  test("harmonic centrality: exact L/d fractions on a hand graph") {
    // star 0–{1,2,3} plus chain 3–4: from seed 0 — three at d=1, one at
    // d=2; L = lcm(1..2) = 2: harm = 3·2 + 1·1 = 7 over 2
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L))
    val got = Centrality.harmonicCentrality(edges.toDF("a", "b"), "a", "b",
        Seq(0L).toDF("n"), "n", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 4L, 7L, 2L)))
  }

  test("harmonic centrality matches the distance reference on random graphs") {
    val rng = new scala.util.Random(73L)
    val edges = Seq.fill(100)((rng.nextInt(20).toLong, rng.nextInt(20).toLong))
    val seeds = Set(1L, 4L, 9L)
    val maxHops = 4
    val L = 12L // lcm(1..4)
    val d = refDist(edges, seeds, maxHops)
    val expect = seeds.map { s =>
      val reached = d.collect { case ((`s`, n), dd) if dd > 0 => dd }
      s -> ((reached.size.toLong, reached.map(L / _).sum, L))
    }.toMap
    val got = Centrality.harmonicCentrality(edges.toDF("a", "b"), "a", "b",
        seeds.toSeq.toDF("n"), "n", maxHops)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("parameters are validated") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    val s = Seq(1L).toDF("n")
    intercept[IllegalArgumentException] {
      Centrality.perSeedDistances(e, "a", "b", s, "n", 0)
    }
    intercept[IllegalArgumentException] {
      Centrality.harmonicCentrality(e, "a", "b", s, "n", 21)
    }
  }
}

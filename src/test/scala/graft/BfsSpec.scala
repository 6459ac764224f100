package graft

import graft.graph.Bfs

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    Bfs.hopDistance(edges.toDF("x", "y"), "x", "y",
        sources.toDF("n"), "n", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // plain BFS reference, capped at maxHops
  private def ref(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Long] = {
    val adj = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    var dist = sources.distinct.map(_ -> 0L).toMap
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(_._2 == h - 1).keys
      for (u <- frontier; v <- adj.getOrElse(u, Seq.empty)
           if !dist.contains(v)) dist += v -> h.toLong
    }
    dist
  }

  test("matches reference BFS on random graphs, multiple sources and caps") {
    val rng = new scala.util.Random(29L)
    for (trial <- 1 to 3) {
      val n = 25 + trial * 5
      val edges = Seq.fill(n * 2)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val sources = Seq(0L, 7L, (n - 1).toLong)
      for (cap <- Seq(1, 3, 10)) {
        assert(run(edges, sources, cap) == ref(edges, sources, cap),
          s"trial=$trial cap=$cap")
      }
    }
  }

  test("a path graph caps distances at maxHops; beyond-cap nodes are absent") {
    val path = (0L until 8L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(path, Seq(0L), 3)
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("a source absent from the edge set still reports dist 0") {
    assert(run(Seq((1L, 2L)), Seq(99L), 2) == Map(99L -> 0L))
  }

  // weighted Bellman-Ford reference, capped at maxRounds edges
  private def refW(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                   maxRounds: Int): Map[Long, Long] = {
    val adj = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, (p._2, p._1, p._3)))
      .groupBy(e => (e._1, e._2)).map { case (k, v) => k -> v.map(_._3).min }
      .toSeq.map { case ((s, d), w) => (s, d, w) }
    var dist = sources.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to maxRounds) {
      val relaxed = adj.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    dist
  }

  private def runW(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                   maxRounds: Int,
                   out: Option[java.util.concurrent.atomic.AtomicInteger] = None): Map[Long, Long] =
    Bfs.shortestPaths(edges.toDF("x", "y", "w"), "x", "y", Some("w"),
        sources.toDF("n"), "n", maxRounds, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted shortest paths match the Bellman-Ford reference, round by round") {
    val rng = new scala.util.Random(37L)
    val edges = Seq.fill(80)((rng.nextInt(20).toLong, rng.nextInt(20).toLong,
      1L + rng.nextInt(9).toLong))
    for (cap <- Seq(1, 2, 4, 8))
      assert(runW(edges, Seq(0L, 13L), cap) == refW(edges, Seq(0L, 13L), cap),
        s"cap=$cap")
  }

  test("a longer path with smaller total weight wins over the direct hop") {
    // 1-3 direct costs 10; 1-2-3 costs 2+3=5, needs 2 rounds
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(runW(edges, Seq(1L), 1) == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(runW(edges, Seq(1L), 2) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("parallel edges collapse to their minimum weight") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 4L), (2L, 1L, 7L))
    assert(runW(edges, Seq(1L), 1) == Map(1L -> 0L, 2L -> 4L))
  }

  test("early stop: a converged frontier exits before the round budget") {
    val edges = Seq((1L, 2L, 5L))
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val got = runW(edges, Seq(1L), 10, Some(rounds))
    assert(got == Map(1L -> 0L, 2L -> 5L))
    assert(rounds.get < 10, s"no early stop: ran ${rounds.get}")
  }

  test("negative weights raise instead of returning a bounded-hop non-distance") {
    val edges = Seq((1L, 2L, -3L))
    intercept[Exception](runW(edges, Seq(1L), 2))
  }
}

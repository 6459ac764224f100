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
}

package graft

import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    Triangles.triangles(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  // all-triples reference over the canonical undirected edge set
  private def ref(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (p._1 min p._2, p._1 max p._2)).toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).toSeq.sorted
    for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((a, c)) && e((b, c))
    } yield (a, b, c)
  }

  test("matches the all-triples reference on random graphs") {
    val rng = new scala.util.Random(17L)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 4
      val edges = Seq.fill(n * 4)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      assert(run(edges).sorted == ref(edges).sorted, s"trial=$trial")
    }
  }

  test("K5 has exactly C(5,3)=10 triangles; a star has none") {
    val k5 = for (a <- 0L until 5L; b <- 0L until 5L if a < b) yield (a, b)
    assert(run(k5).size == 10)
    val star = (1L to 10L).map(i => (0L, i))
    assert(run(star).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges do not change the result") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = base ++ base.map(_.swap) ++ Seq((2L, 1L), (3L, 3L), (1L, 1L))
    assert(run(noisy) == Seq((1L, 2L, 3L)))
  }

  test("a high-degree hub generates no wedges (degree orientation)") {
    // hub 0 touches everyone; triangles only via the rim edges
    val rim = Seq((1L, 2L), (3L, 4L))
    val hub = (1L to 30L).map(i => (0L, i))
    val got = run(hub ++ rim)
    assert(got.sorted == Seq((0L, 1L, 2L), (0L, 3L, 4L)))
  }

  test("nodeTriangleCounts aggregates participation per node") {
    // two triangles sharing node 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    val got = Triangles.nodeTriangleCounts(edges.toDF("x", "y"), "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("clusteringCoefficient: exact fractions, triangle-free nodes at 0, deg<2 absent") {
    // triangle {1,2,3} plus pendant 4 on node 3 and a bare edge 5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
    val got = Triangles.clusteringCoefficient(edges.toDF("x", "y"), "x", "y")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 2L, 2L)),   // coeff 1
      2L -> ((2L, 1L, 2L, 2L)),   // coeff 1
      3L -> ((3L, 1L, 2L, 6L))))  // coeff 1/3; 4,5,6 have deg < 2
  }
}

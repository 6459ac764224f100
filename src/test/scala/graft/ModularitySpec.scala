package graft

import graft.graph.Modularity

class ModularitySpec extends SparkSpec {
  import spark.implicits._

  test("hand example: two triangles joined by one bridge edge") {
    // communities {1,2,3} and {4,5,6}; m = 7 edges; bridge 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "label")
    val got = Modularity.perCommunity(edges, "a", "b", labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // community 1: e_c=3, d_c=2+2+3=7 → q_num = 4·7·3 − 49 = 35, den 196
    // community 4: symmetric
    assert(got == Seq((1L, 3L, 7L, 3L, 35L, 196L),
      (4L, 3L, 7L, 3L, 35L, 196L)))
    // total Q = 70/196 = 5/14 — the textbook value for this graph
  }

  test("a random partition scores at most the perfect one, and Q sums " +
       "consistently from the exact fractions") {
    val rnd = new scala.util.Random(17)
    // two dense blobs with sparse cross edges
    val intra = for (c <- Seq(0L, 100L); i <- 1 to 12; j <- 1 to 12; if i < j;
                     if rnd.nextInt(3) > 0) yield (c + i, c + j)
    val cross = Seq.fill(6)((rnd.nextInt(12) + 1L, 100L + rnd.nextInt(12) + 1L))
    val edges = (intra ++ cross).toDF("a", "b")
    def q(labels: Seq[(Long, Long)]): Double = {
      val rows = Modularity.perCommunity(edges, "a", "b", labels.toDF("node", "label"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      rows.map(r => r._5.toDouble / r._6).sum
    }
    val nodes = (1L to 12L) ++ (101L to 112L)
    val truth = nodes.map(n => n -> (if (n <= 12L) 1L else 2L))
    val random = nodes.map(n => n -> (n % 2))
    assert(q(truth) > 0.3, s"true partition scored ${q(truth)}")
    assert(q(truth) > q(random),
      s"random partition ${q(random)} beat the planted one ${q(truth)}")
  }

  test("duplicate / reversed / self-loop edges canonicalize away") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
      .toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    val got = Modularity.perCommunity(edges, "a", "b", labels)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // canonical edges: (1,2), (2,3) → m=2, one community: e=2, d=1+2+1=4
    assert(got == Seq((1L, 3L, 4L, 2L, 4L * 2 * 2 - 16L, 16L)))
  }
}

package graft

import graft.text.Dedup

/** Randomized parity for the pointer-jumping connected components:
  * random graphs (including empty edge sets, duplicate edges, long
  * chains, and dense blobs) against a plain union-find. Any propagation
  * bug — a dropped asker, a wrong jump, premature convergence — shows up
  * as a label mismatch. */
class ClustersPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(41L)

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min reachable id per node = root after path compression with min-merge
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("clusters == union-find on 10 random graphs + adversarial shapes") {
    val shapes: Seq[(Int, Seq[(Long, Long)])] =
      Seq(
        (5, Seq.empty[(Long, Long)]),                                // no edges
        (12, (0L until 11L).map(i => (i, i + 1))),                   // one long chain
        (8, for { a <- 0L until 8L; b <- a + 1 until 8L } yield (a, b)), // clique
        (6, Seq((0L, 1L), (0L, 1L), (1L, 0L), (4L, 5L)))             // dup + swapped edges
      ) ++ (1 to 10).map { _ =>
        val n = 6 + rng.nextInt(30)
        val m = rng.nextInt(n * 2)
        (n, Seq.fill(m) {
          val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
          if (a < b) (a, b) else (b, a)
        }.filter(e => e._1 != e._2))
      }
    shapes.zipWithIndex.foreach { case ((n, edges), trial) =>
      val docs = (0L until n.toLong).toDF("doc_id")
      val edgeDf = edges.toDF("doc_a", "doc_b")
      val got = Dedup.clusters(docs, edgeDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial n=$n edges=$edges\n got=$got\nwant=$want")
    }
  }

  test("clustersStars (big-star/small-star) == union-find on the same graph family") {
    val shapes: Seq[(Int, Seq[(Long, Long)])] =
      Seq(
        (5, Seq.empty[(Long, Long)]),
        (12, (0L until 11L).map(i => (i, i + 1))),                   // chain: worst diameter
        (8, for { a <- 0L until 8L; b <- a + 1 until 8L } yield (a, b)),
        (6, Seq((0L, 1L), (0L, 1L), (1L, 0L), (4L, 5L))),            // dup + swapped edges
        (9, Seq((0L, 8L), (8L, 2L), (3L, 4L)))                       // star + pair + isolates
      ) ++ (1 to 4).map { _ => // fewer random trials than the jump suite:
        // each stars trial pays several checkpointed edge-rewrite rounds
        // of fixed Spark latency, and the adversarial shapes above already
        // cover the convergence-risky structures
        val n = 6 + rng.nextInt(30)
        val m = rng.nextInt(n * 2)
        (n, Seq.fill(m) {
          val a = rng.nextInt(n).toLong; val b = rng.nextInt(n).toLong
          if (a < b) (a, b) else (b, a)
        }.filter(e => e._1 != e._2))
      }
    shapes.zipWithIndex.foreach { case ((n, edges), trial) =>
      val docs = (0L until n.toLong).toDF("doc_id")
      val edgeDf = edges.toDF("doc_a", "doc_b")
      val got = Dedup.clustersStars(docs, edgeDf).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"stars trial $trial n=$n edges=$edges\n got=$got\nwant=$want")
    }
  }

  test("the all-shuffle rounds (huge-graph path) produce the same clusters") {
    // at test scale |V| is always under the broadcast cap, so the
    // at-scale shuffle rounds would otherwise never execute: force them
    // with broadcastMaxLabels = 0 and require exact parity on the shapes
    // that exercise multi-round convergence
    val shapes: Seq[(Int, Seq[(Long, Long)])] = Seq(
      (12, (0L until 11L).map(i => (i, i + 1))),                     // chain: most rounds
      (8, for { a <- 0L until 8L; b <- a + 1 until 8L } yield (a, b)), // clique: 1 round
      (9, Seq((0L, 8L), (8L, 2L), (3L, 4L)))                        // star + pair + isolates
    )
    shapes.foreach { case (n, edges) =>
      val docs = (0L until n.toLong).toDF("doc_id")
      val edgeDf = edges.toDF("doc_a", "doc_b")
      val shuffled = Dedup.clusters(docs, edgeDf, broadcastMaxLabels = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shuffled == unionFind(n, edges), s"shuffle path diverged: n=$n edges=$edges")
    }
  }
}

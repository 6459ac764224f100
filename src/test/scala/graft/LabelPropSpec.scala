package graft

import org.apache.spark.sql.functions._

import graft.graph.LabelProp

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: synchronous plurality vote, smallest-label
    * tiebreak, over the deduplicated bidirectional neighbor sets. */
  private def ref(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lbl = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = nbrs.map { case (n, ns) =>
        val counts = ns.map(lbl).groupBy(identity).map { case (l, xs) => (l, xs.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int,
                  out: Option[java.util.concurrent.atomic.AtomicInteger] = None) =
    LabelProp.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cliques bridged by one edge settle into two communities") {
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))
    val got = run(edges, 5)
    // each clique converges onto its smallest member's label
    assert(Seq(1L, 2L, 3L, 4L).map(got).distinct.size == 1)
    assert(Seq(10L, 11L, 12L, 13L).map(got).distinct.size == 1)
    assert(got(1L) != got(11L), s"bridge merged the cliques: $got")
    assert(got == ref(edges, 5))
  }

  test("matches the synchronous reference on a random graph, round by round") {
    val rng = new scala.util.Random(23L)
    val edges = Seq.fill(150)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    for (r <- 1 to 3) assert(run(edges, r) == ref(edges, r), s"rounds=$r")
  }

  test("parallel edges do not vote twice; self-loops are dropped") {
    // node 3's neighbors are {1, 2}; 10 parallel (3,2) edges must not
    // make 2's label win over 1's smaller label at the tie
    val edges = Seq((3L, 1L)) ++ Seq.fill(10)((3L, 2L)) ++ Seq((3L, 3L), (1L, 2L))
    val got = run(edges, 1)
    assert(got(3L) == 1L, s"multiplicity or self-loop voted: $got")
    assert(got == ref(edges, 1))
  }

  test("early stop: a stable labeling exits before the round budget") {
    // a single edge pair: round 1 swaps labels 1<->2? no — each adopts
    // the other's label; round 2 swaps back. Use a triangle: round 1
    // sends every node to label 1, round 2 is a no-op -> stop at 2.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val got = run(edges, 10, Some(rounds))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(rounds.get < 10, s"no early stop: ran ${rounds.get}")
    assert(got == ref(edges, 10))
  }

  test("rejects a non-positive round budget") {
    intercept[IllegalArgumentException](
      LabelProp.labelPropagation(Seq((1L, 2L)).toDF("a", "b"), "a", "b", 0))
  }

  // ── warm start (r14): the PageRank/HITS `prior` contract ──────────────

  private def runWarm(edges: Seq[(Long, Long)], rounds: Int,
                      prior: Seq[(Long, Long)],
                      out: Option[java.util.concurrent.atomic.AtomicInteger] = None) =
    LabelProp.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds, out,
        prior = Some(prior.toDF("node", "label")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("warm start: continuing j rounds from round-k labels == cold k+j rounds") {
    val rng = new scala.util.Random(71L)
    val edges = Seq.fill(150)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
    val cold2 = run(edges, 2).toSeq
    assert(runWarm(edges, 1, cold2) == ref(edges, 3))
    assert(runWarm(edges, 2, cold2) == ref(edges, 4))
  }

  test("warm start from a converged prior exits after ONE round, identical") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val cold = run(edges, 10)
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val warm = runWarm(edges, 50, cold.toSeq, Some(rounds))
    assert(warm == cold)
    assert(rounds.get == 1, s"converged prior re-walked: ran ${rounds.get}")
  }

  test("warm start: new nodes start cold, vanished prior rows ignored") {
    // prior covers a triangle already settled on label 1; the delta adds
    // node 4 hanging off 3, and a stale row for vanished node 99
    val prior = Seq((1L, 1L), (2L, 1L), (3L, 1L), (99L, 7L))
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = runWarm(edges, 1, prior)
    assert(!got.contains(99L), s"vanished node survived: $got")
    // node 4 (cold label 4) adopts its only neighbor's prior label 1;
    // node 3 now hears {1, 1, 4} -> plurality 1
    assert(got(4L) == 1L && got(3L) == 1L, s"$got")
  }

  test("warm start: a prior with duplicate node rows RAISES, never fans out") {
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val dup = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("node", "label")
    intercept[Exception](
      LabelProp.labelPropagation(edges, "a", "b", 1, prior = Some(dup)).collect())
    intercept[IllegalArgumentException](
      LabelProp.labelPropagation(edges, "a", "b", 1,
        prior = Some(Seq((1L, 1L)).toDF("node", "oops"))))
  }
}

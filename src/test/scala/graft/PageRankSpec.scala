package graft

import graft.graph.PageRank

/** Exact-integer PageRank vs a plain-Scala reference iteration — same
  * fixed-point arithmetic, so parity is cell-exact, not approximate. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 1000000L

  // the same fixed-point iteration, single-threaded
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> SCALE).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += r(s) / outdeg(s)
      r = nodes.map(n => n -> (15L * SCALE / 100L + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the reference iteration on a random directed graph (dangling included)") {
    val rng = new scala.util.Random(7L)
    // 40 nodes, 250 random edges: duplicates (weight), self-loops, sinks
    val edges = Seq.fill(250)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    for (iters <- Seq(1, 3)) {
      assert(run(edges, iters) == ref(edges, iters), s"iters=$iters")
    }
  }

  test("star graph: the hub outranks every leaf, leaves tie") {
    // undirected star 0–{1..8}: hub collects 8 whole ranks, leaves 1/8 each
    val spokes = (1L to 8L).flatMap(i => Seq((0L, i), (i, 0L)))
    val got = run(spokes, 3)
    val leafRanks = (1L to 8L).map(got)
    assert(leafRanks.distinct.size == 1, s"leaves should tie: $got")
    assert(got(0L) > leafRanks.head * 3, s"hub should dominate: $got")
  }

  test("rank mass is conserved up to truncation on a regular cycle") {
    // on a directed cycle every node has outdeg 1: no truncation loss at
    // all, so total mass is exactly n*scale every iteration
    val n = 12L
    val cycle = (0L until n).map(i => (i, (i + 1) % n))
    val got = run(cycle, 5)
    assert(got.values.toSet == Set(SCALE), s"cycle is rank-uniform: $got")
  }

  test("rejects bad parameters and non-positive weights") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](PageRank.pageRank(e, "s", "d", 0))
    intercept[IllegalArgumentException](PageRank.pageRank(e, "s", "d", 1, scale = 10L))
    val ew = Seq((1L, 2L, 0L)).toDF("s", "d", "w")
    intercept[Exception](
      PageRank.pageRank(ew, "s", "d", 1, weightCol = Some("w")).collect())
  }

  // weighted reference: contribution = r*w / sum(w over src's out-edges)
  private def refW(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outw = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    var r = nodes.map(_ -> SCALE).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d, w) <- edges) contrib(d) += r(s) * w / outw(s)
      r = nodes.map(n => n -> (15L * SCALE / 100L + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  test("weighted ranks match the reference; all-weights-1 equals unweighted") {
    val rng = new scala.util.Random(31L)
    val edges = Seq.fill(200)(
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong, 1L + rng.nextInt(9).toLong))
    val got = PageRank.pageRank(edges.toDF("s", "d", "w"), "s", "d", 3,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refW(edges, 3))
    val unit = edges.map { case (s, d, _) => (s, d, 1L) }
    val gotUnit = PageRank.pageRank(unit.toDF("s", "d", "w"), "s", "d", 3,
        weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotUnit == run(unit.map(t => (t._1, t._2)), 3))
  }

  test("early stop: a rank-stable graph exits after one round, result unchanged") {
    // 4-cycle, bidirectional: 2-regular and 2 | scale, so round 1 maps
    // every rank to exactly `scale` — an integer fixed point from the
    // start. 10 requested rounds must execute as 1.
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("s", "d")
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val got = PageRank.pageRank(edges, "s", "d", iterations = 10,
        roundsOut = Some(rounds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds.get == 1, s"expected early stop after 1 round, ran ${rounds.get}")
    assert(got == Map(1L -> SCALE, 2L -> SCALE, 3L -> SCALE, 4L -> SCALE))
  }

  test("warm start: continuing j rounds from round-k ranks == cold k+j rounds") {
    val rng = new scala.util.Random(23L)
    val edges = Seq.fill(200)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    val eDf = edges.toDF("s", "d")
    val after2 = PageRank.pageRank(eDf, "s", "d", iterations = 2)
    val warm = PageRank.pageRank(eDf, "s", "d", iterations = 3,
        prior = Some(after2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == ref(edges, 5))
  }

  test("warm start from a converged prior exits after ONE round, bit-identical") {
    // rank-stable graph: directed cycle is at its fixed point immediately
    val n = 10L
    val cycle = (0L until n).map(i => (i, (i + 1) % n)).toDF("s", "d")
    val cold = PageRank.pageRank(cycle, "s", "d", iterations = 8)
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val warm = PageRank.pageRank(cycle, "s", "d", iterations = 50,
      prior = Some(cold), roundsOut = Some(rounds))
    assert(rounds.get == 1, s"expected 1 verification round, ran ${rounds.get}")
    assert(warm.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == cold.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("warm start: new nodes start at scale, vanished prior nodes are ignored") {
    val prior = Seq((1L, 777L), (99L, 5L)).toDF("node", "rank") // 99 vanished
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d") // node 2 is new
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val got = PageRank.pageRank(edges, "s", "d", iterations = 1,
        prior = Some(prior), roundsOut = Some(rounds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 from r = {1 → 777, 2 → SCALE}: r(2) = base + 85·777/100
    val base = 15L * SCALE / 100L
    assert(got == Map(1L -> (base + 85L * SCALE / 100L),
      2L -> (base + 85L * 777L / 100L)))
    assert(!got.contains(99L))
    intercept[IllegalArgumentException](PageRank.pageRank(edges, "s", "d", 1,
      prior = Some(Seq((1L, 1L)).toDF("node", "oops"))))
  }

  test("edge delta: warm re-rank from the old fixed point beats the cold trajectory") {
    // the q214 scenario: rank E to its exact integer fixed point, perturb
    // with a small ΔE (one new node, two new bidirectional links), then
    // re-rank E ∪ ΔE (a) cold and (b) warm-seeded with the old ranks —
    // the warm run must reach ITS fixed point in strictly fewer rounds
    val rng = new scala.util.Random(7L)
    val base0 = Seq.fill(150)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val base = (base0 ++ base0.map(_.swap)).distinct
    val delta = Seq((0L, 40L), (40L, 0L), (40L, 3L), (3L, 40L))
    val cap = 120
    val coldRounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val cold = PageRank.pageRank(base.toDF("s", "d"), "s", "d",
      iterations = cap, roundsOut = Some(coldRounds))
    val fullRounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    PageRank.pageRank((base ++ delta).toDF("s", "d"), "s", "d",
      iterations = cap, roundsOut = Some(fullRounds)).collect()
    val warmRounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    PageRank.pageRank((base ++ delta).toDF("s", "d"), "s", "d",
      iterations = cap, prior = Some(cold),
      roundsOut = Some(warmRounds)).collect()
    // the prior run and the warm run genuinely converged (exact fixed
    // point, not the cap); the cold run on the delta'd set oscillates in
    // an integer limit cycle and burns the whole budget (deterministic —
    // observed: cold=21, full=120(cap), warm=22) — warm start is the
    // difference between ~20 rounds and never settling
    assert(coldRounds.get < cap && warmRounds.get < cap,
      s"no fixed point within $cap rounds: cold=${coldRounds.get} " +
        s"warm=${warmRounds.get}")
    assert(warmRounds.get < fullRounds.get,
      s"warm ${warmRounds.get} rounds !< cold ${fullRounds.get} rounds")
  }

  test("warm start: a prior with duplicate node rows RAISES, never fans out") {
    // duplicate (node, rank) rows would left-join-fan-out the rank frame
    // and silently double every downstream contribution — must raise
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val dup = Seq((1L, 777L), (1L, 778L), (2L, 5L)).toDF("node", "rank")
    val e = intercept[Exception](PageRank.pageRank(edges, "s", "d", 1,
      prior = Some(dup)).collect())
    def msg(t: Throwable): String =
      Option(t).map(x => x.getMessage + msg(x.getCause)).getOrElse("")
    assert(msg(e).contains("must be unique"), msg(e))
    // a unique prior over the same nodes is untouched by the guard
    val ok = Seq((1L, 777L), (2L, 5L)).toDF("node", "rank")
    assert(PageRank.pageRank(edges, "s", "d", 1, prior = Some(ok)).count() == 2)
  }

  test("early stop never fires before the fixed point: star graph runs all rounds") {
    // directed star 1->2..1->5 plus back-edges: ranks keep moving for the
    // first rounds, so all requested rounds must execute and the result
    // must equal the driver-side reference
    val edges = (2L to 5L).flatMap(k => Seq((1L, k), (k, 1L)))
    val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
    val got = PageRank.pageRank(edges.toDF("s", "d"), "s", "d", iterations = 3,
        roundsOut = Some(rounds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rounds.get == 3, s"expected all 3 rounds, ran ${rounds.get}")
    assert(got == run(edges, 3))
  }

  // personalized reference: mass and teleport land on seeds only
  private def refP(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val nodes = ((edges.map(_._1) ++ edges.map(_._2)) ++ seeds).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(n => n -> (if (seeds(n)) SCALE else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) contrib(d) += r(s) / outdeg(s)
      r = nodes.map(n => n ->
        ((if (seeds(n)) 15L * SCALE / 100L else 0L) + 85L * contrib(n) / 100L)).toMap
    }
    r
  }

  private def runP(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int): Map[Long, Long] =
    PageRank.personalizedPageRank(edges.toDF("s", "d"),
        "s", "d", seeds.toSeq.toDF("node"), "node", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("personalized: matches the seed-restart reference on a random graph") {
    val rng = new scala.util.Random(17L)
    val edges = Seq.fill(250)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    for (iters <- Seq(1, 3))
      assert(runP(edges, Set(0L, 7L, 13L), iters) == refP(edges, Set(0L, 7L, 13L), iters),
        s"iters=$iters")
  }

  test("personalized: mass stays in the seed's reachable component") {
    // two disjoint 3-cycles; seeding one leaves the other at rank 0
    val c1 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val c2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val got = runP(c1 ++ c2, Set(0L), 4)
    assert(Seq(10L, 11L, 12L).forall(got(_) == 0L), s"mass leaked: $got")
    // the walk circulates — which node leads depends on the round — but
    // the seeded cycle always carries mass and matches the reference
    assert(Seq(0L, 1L, 2L).map(got).sum > 0L, s"seeded cycle is dry: $got")
    assert(got == refP(c1 ++ c2, Set(0L), 4))
  }

  test("personalized: a seed outside the edge set holds its teleport mass") {
    val got = runP(Seq((1L, 2L)), Set(99L), 2)
    assert(got(99L) == 15L * SCALE / 100L)
    assert(got(2L) > 0L || got(1L) >= 0L) // graph nodes present in output
    assert(got.keySet == Set(1L, 2L, 99L))
  }

  test("personalized: empty seed set yields all-zero ranks") {
    val got = runP(Seq((1L, 2L), (2L, 1L)), Set.empty, 3)
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }
}

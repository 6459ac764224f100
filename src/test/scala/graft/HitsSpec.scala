package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.graph.Hits

/** Exact-integer HITS vs a plain-Scala reference iteration — same
  * max-rescaled fixed-point arithmetic, so parity is cell-exact. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 10000L

  // the same iteration, single-threaded: gather, max-rescale, repeat
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> SCALE).toMap
    var a = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      val araw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) araw(d) += h(s)
      val amax = araw.values.max
      a = nodes.map(n => n -> araw(n) * SCALE / amax).toMap
      val hraw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) hraw(s) += a(d)
      val hmax = hraw.values.max
      h = nodes.map(n => n -> hraw(n) * SCALE / hmax).toMap
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int,
                  rounds: Option[AtomicInteger] = None): Map[Long, (Long, Long)] =
    Hits.hits(edges.toDF("s", "d"), "s", "d", iters, roundsOut = rounds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("matches the reference iteration on a random directed graph") {
    val rng = new scala.util.Random(11L)
    // 30 nodes, 150 edges: duplicates (weight), self-loops, sinks, sources
    val edges = Seq.fill(150)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    for (iters <- Seq(1, 3))
      assert(run(edges, iters) == ref(edges, iters), s"iters=$iters")
  }

  test("hand example: two sources into one sink") {
    // 1→3, 2→3: the sink is the sole authority, the sources tie as hubs,
    // and the sink (no out-edges) has hub 0
    val got = run(Seq((1L, 3L), (2L, 3L)), 2)
    assert(got == Map(1L -> (SCALE, 0L), 2L -> (SCALE, 0L), 3L -> (0L, SCALE)))
  }

  test("bipartite graph: roles separate exactly by side") {
    // parts {0,2,4} → suppliers {1,3}: every part is pure hub, every
    // supplier pure authority
    val edges = Seq((0L, 1L), (0L, 3L), (2L, 1L), (4L, 3L), (4L, 1L))
    val got = run(edges, 3)
    for (p <- Seq(0L, 2L, 4L)) assert(got(p)._2 == 0L, s"part $p has auth")
    for (s <- Seq(1L, 3L)) assert(got(s)._1 == 0L, s"supplier $s has hub")
    // supplier 1 (indeg 3) out-ranks supplier 3 (indeg 2)
    assert(got(1L)._2 > got(3L)._2)
  }

  test("exact fixed point stops early and is output-identical to the full run") {
    val edges = Seq((1L, 3L), (2L, 3L))  // stable after round 2 (see above)
    val rounds = new AtomicInteger(-1)
    val short = run(edges, 2)
    val long = run(edges, 10, Some(rounds))
    assert(long == short)
    assert(rounds.get == 2, s"expected early stop at round 2, ran ${rounds.get}")
  }

  test("no premature stop while scores still move") {
    // the skewed bipartite graph from above keeps refining hub 2's score
    // for several rounds (6000 → 5652 → ...): every budgeted round must
    // actually run, and each extra round must still match the reference
    val edges = Seq((0L, 1L), (0L, 3L), (2L, 1L), (4L, 3L), (4L, 1L))
    val rounds = new AtomicInteger(-1)
    val r3 = run(edges, 3, Some(rounds))
    assert(rounds.get == 3, s"stopped early at ${rounds.get}")
    assert(r3 == ref(edges, 3))
    assert(r3 != run(edges, 2), "round 3 should still change scores")
  }

  test("parallel edges add weight") {
    // doubled edge 1→3 vs single 2→3: hub 1 gathers the authority twice
    val got = run(Seq((1L, 3L), (1L, 3L), (2L, 3L)), 1)
    val ex = ref(Seq((1L, 3L), (1L, 3L), (2L, 3L)), 1)
    assert(got == ex)
    assert(got(1L)._1 == SCALE && got(2L)._1 == SCALE / 2)
  }

  test("empty edge set raises (no structure to rank)") {
    val e = intercept[Exception] {
      run(Seq.empty[(Long, Long)], 1)
    }
    assert(e.getMessage != null)
  }

  test("iterations and scale are validated") {
    intercept[IllegalArgumentException] {
      Hits.hits(Seq((1L, 2L)).toDF("s", "d"), "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Hits.hits(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 1, scale = 10L)
    }
  }

  test("warm start: continuing j rounds from round-k scores == cold k+j rounds") {
    val rng = new scala.util.Random(17L)
    val edges = Seq.fill(150)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
    val cold2 = Hits.hits(edges.toDF("s", "d"), "s", "d", 2)
    val warm = Hits.hits(edges.toDF("s", "d"), "s", "d", 3, prior = Some(cold2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(warm == ref(edges, 5))
  }

  test("warm start from a converged prior exits after ONE round, bit-identical") {
    // two disjoint edges reach their exact fixed point in two rounds
    val edges = Seq((1L, 2L), (3L, 4L))
    val cold = Hits.hits(edges.toDF("s", "d"), "s", "d", 6)
    val rounds = new AtomicInteger(-1)
    val warm = Hits.hits(edges.toDF("s", "d"), "s", "d", 50,
      prior = Some(cold), roundsOut = Some(rounds))
    assert(rounds.get == 1, s"expected 1 verification round, ran ${rounds.get}")
    assert(warm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == cold.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("warm start: new nodes start cold, vanished prior rows ignored, bad shape raises") {
    // prior hubs 100 vs 300 flow through one round; node 99 vanished
    val prior = Seq((1L, 100L, 0L), (2L, 300L, 0L), (99L, 5L, 5L))
      .toDF("node", "hub", "auth")
    val edges = Seq((1L, 3L), (2L, 4L)).toDF("s", "d")
    val got = Hits.hits(edges, "s", "d", iterations = 1, prior = Some(prior))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // araw = {3→100, 4→300}, amax 300 → a(3)=3333, a(4)=SCALE;
    // hraw = {1→3333, 2→SCALE}, hmax SCALE → h(1)=3333, h(2)=SCALE
    assert(got == Map(1L -> (3333L, 0L), 2L -> (SCALE, 0L),
      3L -> (0L, 3333L), 4L -> (0L, SCALE)))
    assert(!got.contains(99L))
    intercept[IllegalArgumentException](Hits.hits(edges, "s", "d", 1,
      prior = Some(Seq((1L, 1L)).toDF("node", "oops"))))
  }

  test("warm start: a prior with duplicate node rows RAISES, never fans out") {
    val dup = Seq((1L, 10L, 0L), (1L, 20L, 0L)).toDF("node", "hub", "auth")
    val edges = Seq((1L, 2L)).toDF("s", "d")
    def m(t: Throwable): String =
      Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
    val e = intercept[Exception](
      Hits.hits(edges, "s", "d", 1, prior = Some(dup)).collect())
    assert(m(e).contains("must be unique"), m(e))
  }
}

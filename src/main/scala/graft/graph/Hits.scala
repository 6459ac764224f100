package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** HITS (Kleinberg hubs & authorities) by synchronous power iteration —
  * the DIRECTED-role complement to [[PageRank]]: PageRank scores a single
  * notion of importance; HITS separates "points at good things" (hub)
  * from "is pointed at by good hubs" (authority). On a bipartite
  * interaction graph (buyers→products, parts→suppliers, queries→docs)
  * the two sides naturally carry one score each.
  *
  * All arithmetic is EXACT 64-bit integer math so a SQL oracle replays
  * every iteration cell-for-cell: scores live in fixed-point units of
  * 1/`scale`, and the per-round normalization — classically an L2 norm,
  * a square root no integer oracle can replay — is replaced by MAX
  * rescaling: `x ← (x·scale) div max(x)` (truncating division, identical
  * in Spark `div` and DuckDB `//` on the non-negative values here). Max
  * rescaling preserves the fixed point's direction exactly like any
  * positive-scalar normalization and keeps every score in [0, scale].
  *
  * Scale shape (per round): TWO equi-joins of the O(nodes) score table
  * against the edge table — one keyed on src (authority gather), one on
  * dst (hub gather) — each followed by a map-side-combined aggregation,
  * plus two O(1) driver scalars (the maxima; the same bounded-driver-
  * state class as the convergence scans — embedding them as literals
  * keeps the plan free of the constant-key join that degrades to a
  * plan-audit-banned nested-loop cross). The edge table is materialized
  * TWICE up front, pre-partitioned on src and on dst, so every round
  * exchanges only the score table. Score frames are lineage-truncated
  * through [[Checkpoints.checkpoint]] each round.
  *
  * Int64 bounds: hub ≤ scale, so a raw authority is ≤ indeg·scale and
  * the rescale product is ≤ maxRaw·scale — guarded at runtime
  * (`maxRaw ≤ 2^63/scale`, i.e. in-degree ≤ 9.2e14 at the default
  * scale 10^4). Shrink `scale` for graphs beyond that.
  */
object Hits {

  /** Hub/authority scores after `iterations` synchronous rounds over the
    * DIRECTED edge set `edges(srcCol, dstCol)` (BIGINT node ids; parallel
    * edges are NOT deduplicated — pre-`distinct` if multiplicity should
    * not add weight). Node set = union of sources and destinations.
    * Every node starts at hub = `scale`; each round computes
    * `auth(v) = Σ_{u→v} hub(u)` then `hub(u) = Σ_{u→v} auth(v)`, each
    * max-rescaled to [0, scale]. Output (node, hub, auth), ordered by
    * node; sources never pointed at have auth 0, sinks with no out-edges
    * have hub 0.
    *
    * EARLY STOP: exits on the first round that leaves every (hub, auth)
    * EXACTLY unchanged — the update is a pure function of the score
    * table (the maxima included), so a no-op round makes all further
    * rounds no-ops and a chained-CTE oracle that always writes
    * `iterations` rounds still replays the result cell-for-cell. The
    * check is exact (the new frame carries the previous scores; one
    * limit-1 scan of the materialized checkpoint), never a probabilistic
    * signature. `roundsOut`, when supplied, receives the executed round
    * count (observability / spec hook).
    *
    * Degenerate graphs where a round's gathered scores are ALL zero
    * (e.g. every edge out of a zero-hub node) raise rather than divide
    * by zero — such a graph has no hub/authority structure to rank.
    *
    * WARM START (r14, the [[PageRank.pageRank]] `prior` contract ported):
    * `prior` (a (node, hub, auth) frame — the exact output shape of a
    * previous [[hits]] run) seeds the initial score table instead of the
    * uniform hub = `scale`. Each round is a pure function of the score
    * table (the max normalizers included), so continuing j rounds from a
    * round-k table is EXACTLY rounds k+1..k+j of the cold run — after a
    * small edge delta, scores are near the old fixed point and the exact
    * early stop exits in one-or-few rounds instead of re-walking the
    * cold trajectory. Nodes absent from `prior` (new in the delta'd edge
    * set) start cold (hub = `scale`, auth = 0); prior rows for vanished
    * nodes are ignored (the node set always derives from the edges);
    * duplicate prior nodes RAISE (two scores for one node has no right
    * answer). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int, scale: Long = 10000L,
           roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None,
           prior: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(scale >= 100 && scale <= 100000000L,
      "scale must be in [100, 1e8] (Int64 rescale headroom)")
    // materialize the caller's (possibly expensive) edge construction
    // ONCE, then keep one copy per join key so neither round-join
    // re-shuffles the O(edges) side
    val e = Checkpoints.checkpoint(
      edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst")))
    val nodes = Checkpoints.checkpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val eSrc0 = Checkpoints.checkpoint(e.repartition(col("src")))
    val eDst0 = Checkpoints.checkpoint(e.repartition(col("dst")))
    Checkpoints.release(e)
    // loop-shape selection — the [[PageRank.pageRank]] regime rule:
    // broadcast shape while the smaller round-join side fits the
    // planner's broadcast threshold, explicit co-partitioned pre-sorted
    // merge shape above it (per round: zero broadcasts, zero edge
    // exchanges/sorts — only the two gather aggregations' exchanges,
    // the shuffles HITS fundamentally needs)
    val spark = edges.sparkSession
    val pinned = !Checkpoints.broadcastRegime(spark,
      Checkpoints.planStats(nodes).min(Checkpoints.planStats(eSrc0)))
    val parts = Checkpoints.sizedParts(spark,
      Checkpoints.materializedBytes(eSrc0).getOrElse(Long.MaxValue))
    def mh(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (pinned) df.hint("merge") else df
    val (eSrc, eDst) =
      if (!pinned) (eSrc0, eDst0)
      else {
        val es = Checkpoints.checkpoint(eSrc0
          .repartition(parts, col("src")).sortWithinPartitions("src"),
          declare = true)
        val ed = Checkpoints.checkpoint(eDst0
          .repartition(parts, col("dst")).sortWithinPartitions("dst"),
          declare = true)
        Checkpoints.release(eSrc0)
        Checkpoints.release(eDst0)
        (es, ed)
      }

    def pinN(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      if (pinned) df.repartition(parts, col("node")).sortWithinPartitions("node")
      else df
    var state = Checkpoints.checkpoint(declare = pinned, df = pinN(prior match {
      case Some(p) =>
        require(p.columns.contains("node") && p.columns.contains("hub") &&
          p.columns.contains("auth"),
          "prior must carry (node, hub, auth) — the hits output shape")
        // de-fan BEFORE the seed join (the PageRank.prior discipline): a
        // duplicate node row would row-multiply the score frame through
        // the left join; duplicates RAISE instead of being averaged away
        val p1 = p.select(col("node"), col("hub").cast(LongType).as("__ph"),
            col("auth").cast(LongType).as("__pa"))
          .groupBy("node")
          .agg(max("__ph").as("__ph"), max("__pa").as("__pa"),
            count(lit(1)).as("__pn"))
          .select(col("node"),
            when(col("__pn") === 1L, col("__ph"))
              .otherwise(raise_error(format_string(
                "hits: prior has %s rows for node %s — (node, hub, auth) " +
                  "must be unique", col("__pn").cast("string"),
                col("node").cast("string")))).as("__ph"),
            col("__pa"))
        nodes.join(p1, Seq("node"), "left")
          .select(col("node"), coalesce(col("__ph"), lit(scale)).as("h"),
            coalesce(col("__pa"), lit(0L)).as("a"))
      case None =>
        nodes.select(col("node"), lit(scale).as("h"), lit(0L).as("a"))
    }))
    Checkpoints.release(nodes)
    var rounds = 0
    var converged = false
    while (rounds < iterations && !converged) {
      // authority gather: one equi-join keyed on src, map-side-combined
      // sum on dst; materialized because BOTH the max scalar and the
      // rescale join consume it (Spark does no cross-branch CSE)
      val ca = Checkpoints.checkpoint(
        eSrc.join(mh(state.select(col("node"), col("h"))),
            eSrc("src") === col("node"))
          .groupBy("dst").agg(sum("h").as("raw")))
      val amax = maxRaw(ca, scale, "authority")
      val aTbl = Checkpoints.checkpoint(declare = pinned, df =
        state.select(col("node"), col("h").as("hp"), col("a").as("ap"))
          .join(mh(ca), col("node") === ca("dst"), "left")
          .select(col("node"), col("hp"), col("ap"),
            coalesce(expr(s"(raw * $scale) div $amax"), lit(0L)).as("a")))
      Checkpoints.release(ca)
      // hub gather: the mirror pass keyed on dst, using the NEW auth
      val ch = Checkpoints.checkpoint(
        eDst.join(mh(aTbl.select(col("node"), col("a"))),
            eDst("dst") === col("node"))
          .groupBy("src").agg(sum("a").as("raw")))
      val hmax = maxRaw(ch, scale, "hub")
      val next = Checkpoints.checkpoint(declare = pinned, df =
        aTbl.select(col("node"), col("hp"), col("ap"), col("a"))
          .join(mh(ch), col("node") === ch("src"), "left")
          .select(col("node"), col("hp"), col("ap"), col("a"),
            coalesce(expr(s"(raw * $scale) div $hmax"), lit(0L)).as("h")))
      Checkpoints.release(aTbl)
      Checkpoints.release(ch)
      rounds += 1
      // exact fixed point? one limit-1 scan of the materialized frame
      converged = rounds < iterations &&
        next.filter(col("h") =!= col("hp") || col("a") =!= col("ap"))
          .limit(1).isEmpty
      Checkpoints.release(state)
      state = next
    }
    roundsOut.foreach(_.set(rounds))
    Checkpoints.release(eSrc)
    Checkpoints.release(eDst)
    state.select(col("node"), col("h").as("hub"), col("a").as("auth"))
      .orderBy("node")
  }

  /** The round's normalizer: one O(1) driver scalar off the materialized
    * gather table, with the Int64 rescale-product guard. */
  private def maxRaw(gathered: DataFrame, scale: Long, side: String): Long = {
    val row = gathered.agg(max("raw")).head()
    val m = if (row.isNullAt(0)) 0L else row.getLong(0)
    require(m > 0,
      s"hits: all gathered $side scores are zero — the graph has no " +
        "hub/authority structure to rank (e.g. no edge chain of length 2)")
    require(m <= Long.MaxValue / scale,
      s"hits: $side rescale product overflows Int64 (max raw $m × scale " +
        s"$scale); shrink scale")
    m
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Distributed PageRank by synchronous power iteration — the rank-propagation
  * complement to the connected-components operator
  * ([[graft.text.Dedup.clusters]]): CC answers "which nodes form a group",
  * PageRank answers "which nodes matter inside the graph".
  *
  * All arithmetic is EXACT 64-bit integer math so a SQL oracle can replay
  * every iteration cell-for-cell: ranks live in fixed-point units of
  * 1/`scale` (default parts-per-million), each edge contributes
  * `rank div outdeg` (truncating division — identical in Spark `div` and
  * DuckDB `//` for the non-negative values used here), and the damping step
  * is `(15*scale) div 100 + (85*sum) div 100`. No doubles anywhere, so no
  * cross-engine float-summation-order drift. Total mass is ≤ n·scale, so
  * 85·sum stays inside Int64 up to ~10^11 nodes at the default scale —
  * shrink `scale` past that.
  *
  * Scale shape (per iteration): ONE equi-join of the rank table against the
  * degree-annotated edge table on the source key, ONE map-side-combined
  * aggregation on the destination key, ONE left join back to the node set
  * for sink nodes with no in-edges. The edge table is hash-repartitioned on
  * `src` once, checkpointed, and reused by every iteration, so each round
  * exchanges only the O(nodes) rank table — the same label-side-only
  * per-round exchange discipline as the CC operator. Rank frames are
  * lineage-truncated through [[Checkpoints.checkpoint]] each round (growth
  * of both the plan and the size-estimate BigInt is clamped; see
  * GraftStatsBarrier).
  */
object PageRank {

  /** Ranks after `iterations` synchronous rounds over the directed edge set
    * `edges(srcCol, dstCol)` (BIGINT node ids; parallel edges are NOT
    * deduplicated — pre-`distinct` if multiplicity should not add weight).
    * The node set is the union of sources and destinations. Every node
    * starts at `scale`; output (node, rank) in rank units of 1/`scale`,
    * ordered by node.
    *
    * With `weightCol` (positive BIGINT) each out-edge carries
    * `rank·w div Σw(src)` instead of `rank div outdeg` — co-occurrence
    * counts, interaction strengths, transition frequencies. The
    * unweighted form is exactly the all-weights-1 case, so both share
    * one arithmetic path (and one oracle shape). Keep `rank·w` inside
    * Int64: worst-case rank ≈ n·scale, so wmax·n·scale must stay below
    * 2^63 — rescale weights or shrink `scale` for extreme graphs.
    *
    * Dangling mass (nodes with no out-edges) is dropped, not redistributed
    * — the variant that keeps per-iteration arithmetic oracle-replayable
    * without a global mass term; for undirected (bidirectional) edge sets
    * there are no dangling nodes and the distinction vanishes.
    *
    * EARLY STOP: the loop exits as soon as a round leaves every rank
    * EXACTLY unchanged (integer fixed point). A no-op round makes every
    * further round a no-op too — the update is a pure function of the
    * rank table — so stopping is indistinguishable from running all
    * `iterations` rounds and a chained-CTE oracle that always writes
    * `iterations` CTEs still replays the result cell-for-cell. The check
    * is exact (each round's frame carries its predecessor rank; one scan
    * of the already-materialized checkpoint, short-circuited by limit-1),
    * never a probabilistic signature — a colliding signature would
    * silently ship wrong ranks. At scale, rounds after stabilization are
    * pure waste; this converts them into one cheap scan.
    * `roundsOut`, when supplied, receives the number of rounds actually
    * executed (observability / spec hook).
    *
    * WARM START: `prior` (a (node, rank) frame — the exact output shape
    * of a previous [[pageRank]] run) seeds the initial rank table instead
    * of the uniform `scale`. The update is a pure function of the rank
    * table, so continuing j rounds from a round-k table is EXACTLY rounds
    * k+1..k+j of the cold run — which is what makes incremental
    * maintenance cheap: after a small edge delta, ranks are near the old
    * fixed point, and the exact early stop exits after one-or-few rounds
    * instead of re-walking the whole cold trajectory. Nodes absent from
    * `prior` (new in the delta'd edge set) start at `scale`; prior rows
    * for vanished nodes are ignored (the node set always derives from
    * the edges). Same oracle shape: warm(k rounds) after cold(j rounds)
    * replays as the cold k+j-round CTE chain. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, scale: Long = 1000000L,
               weightCol: Option[String] = None,
               roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None,
               prior: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(scale >= 100, "scale must be >= 100 (damping uses div 100)")
    val w = weightCol.map(c => col(c).cast(LongType)).getOrElse(lit(1L))
    // materialize the edge list ONCE — nodes and degrees both derive from
    // it, and without this the caller's (possibly expensive) edge
    // construction would recompute per derived checkpoint
    val e = Checkpoints.checkpoint(
      edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"),
        when(w > 0, w).otherwise(raise_error(
          format_string("pageRank: non-positive edge weight %s", w)))
          .as("w")))
    // LOOP SHAPE, picked with the planner's own broadcast rule (r15
    // optimization round, guide §2.4/§3.1): while the edge table's
    // planner estimate fits the broadcast threshold, keep the
    // broadcast-friendly shape (per-round BHJ of a table that small is
    // the fastest plan, and pinning partitions would only add exchanges).
    // Above the threshold — the 100 TB regime — pin explicit-N hash
    // partitioning (never AQE-coalesced, so the checkpoint barrier
    // declares it) on the edge table by src (pre-SORTED, so the merge
    // join re-sorts nothing) and the node/rank tables by node, and hint
    // the round joins to sort-merge: no round then broadcasts or
    // re-exchanges ANY table — the only per-round exchange left is the
    // contrib aggregation's, the one shuffle the algorithm fundamentally
    // needs. N is sized from the MEASURED edge bytes (AQE's advisory
    // rule via sizedParts), so it tracks data, not the local core count.
    val spark = edges.sparkSession
    val nodes0 = Checkpoints.checkpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    // weight-annotated edges: partitioned on src ONCE, reused every round
    val eDeg0 = Checkpoints.checkpoint(
      e.join(outw, "src").repartition(col("src")))
    Checkpoints.release(e) // nodes + eDeg are materialized; e is consumed
    // every round join keeps one of (edge table, rank table) on its
    // build side, so the loop is broadcast-shaped iff the SMALLER of the
    // two stays under the planner's broadcast threshold — the planner's
    // own rule, read off the same post-barrier stats it will use
    val pinned = !Checkpoints.broadcastRegime(spark,
      Checkpoints.planStats(nodes0).min(Checkpoints.planStats(eDeg0)))
    val parts = Checkpoints.sizedParts(spark,
      Checkpoints.materializedBytes(eDeg0).getOrElse(Long.MaxValue))
    def mh(df: DataFrame): DataFrame = if (pinned) df.hint("merge") else df
    val (nodes, eDeg) =
      if (!pinned) (nodes0, eDeg0)
      else {
        // 100 TB regime: re-lay the two loop inputs ONCE as explicit-N
        // hash-partitioned, pre-sorted checkpoints (from the already
        // materialized unpinned ones — one extra cheap pass), so every
        // round's merge joins elide both the exchange and the edge sort
        val n = Checkpoints.checkpoint(nodes0
          .repartition(parts, col("node")).sortWithinPartitions("node"),
          declare = true)
        val ed = Checkpoints.checkpoint(eDeg0
          .repartition(parts, col("src")).sortWithinPartitions("src"),
          declare = true)
        Checkpoints.release(nodes0)
        Checkpoints.release(eDeg0)
        (n, ed)
      }

    val base = 15L * scale / 100L
    // ranks always covers the full node set (invariant of the left join
    // below), so the loop joins against the previous RANK frame, not the
    // node set — which also puts old and new rank side by side for the
    // exact fixed-point test. nodes is consumed once ranks materializes.
    var ranks = Checkpoints.checkpoint(declare = pinned, df = prior match {
      case Some(p) =>
        require(p.columns.contains("node") && p.columns.contains("rank"),
          "prior must carry (node, rank) — the pageRank output shape")
        // one map-side-combined agg de-fans the prior BEFORE the seed
        // join: a duplicate node row would otherwise row-multiply the
        // rank frame (left-join fan-out) and silently double every
        // contribution downstream. Duplicates RAISE (two ranks for one
        // node has no right answer) instead of being averaged away.
        val p1 = p.select(col("node"), col("rank").cast(LongType).as("__prior"))
          .groupBy("node")
          .agg(max("__prior").as("__prior"), count(lit(1)).as("__pn"))
          .select(col("node"),
            when(col("__pn") === 1L, col("__prior"))
              .otherwise(raise_error(format_string(
                "pageRank: prior has %s rows for node %s — (node, rank) " +
                  "must be unique", col("__pn").cast("string"),
                col("node").cast("string")))).as("__prior"))
        nodes.join(p1, Seq("node"), "left")
          .select(col("node"), coalesce(col("__prior"), lit(scale)).as("r"))
      case None => nodes.withColumn("r", lit(scale))
    })
    Checkpoints.release(nodes)
    var rounds = 0
    var converged = false
    while (rounds < iterations && !converged) {
      // in the pinned regime both joins are sort-merge over DECLARED
      // co-partitioned, pre-sorted checkpoints (the barrier carries the
      // physical properties — merge is also the spill-safe strategy at
      // state sizes where no hash build can be assumed to fit); in the
      // broadcast regime the planner's BHJ is kept as-is
      val contribs = eDeg.join(mh(ranks), eDeg("src") === ranks("node"))
        .select(col("dst"), expr("(r * w) div outw").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      val next = Checkpoints.checkpoint(
        ranks.select(col("node"), col("r").as("rp"))
          .join(mh(contribs), col("node") === contribs("dst"), "left")
          .select(col("node"), col("rp"),
            (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r")),
        declare = pinned)
      rounds += 1
      // exact fixed point reached? one scan of the materialized
      // checkpoint, short-circuited at the first changed rank
      converged = rounds < iterations &&
        next.filter(col("r") =!= col("rp")).limit(1).isEmpty
      // the new rank frame is materialized; free the previous round's
      // blocks instead of pinning every iteration's rank table at once
      Checkpoints.release(ranks)
      ranks = next
    }
    roundsOut.foreach(_.set(rounds))
    // the final rank frame is materialized; the loop inputs are done
    Checkpoints.release(eDeg)
    ranks.select(col("node"), col("r").as("rank")).orderBy("node")
  }

  /** Personalized PageRank: random-walk-with-restart importance RELATIVE
    * TO a seed set — "what matters near these nodes", the
    * recommendation / related-items / local-relevance form of
    * [[pageRank]] (global importance). Same exact fixed-point integer
    * arithmetic and per-round shape; two deltas: only seeds start with
    * mass (`scale`), and the teleport term `(15·scale) div 100` lands on
    * SEEDS ONLY each round (the restart distribution) instead of on
    * every node. Nodes outside the seeds' reach stay at rank 0.
    *
    * `seeds` is a DataFrame (any size — it joins, never broadcasts by
    * contract) whose `seedCol` lists the restart nodes; seed ids absent
    * from the edge set still rank (they hold their teleport mass). The
    * node set is endpoints ∪ seeds. Output (node, rank), rank in
    * 1/`scale` units, ordered by node; same early-stop contract as
    * [[pageRank]] (`roundsOut` observes executed rounds). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iterations: Int, scale: Long = 1000000L,
                           roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(scale >= 100, "scale must be >= 100 (damping uses div 100)")
    val e = Checkpoints.checkpoint(
      edges.select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst")))
    val seedSet = seeds.select(col(seedCol).cast(LongType).as("node")).distinct()
    // node table carries the seed flag so the loop never re-joins seeds
    val nodes = Checkpoints.checkpoint(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .join(seedSet.withColumn("s", lit(1L)), Seq("node"), "full_outer")
        .select(col("node"), coalesce(col("s"), lit(0L)).as("seed")))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg0 = Checkpoints.checkpoint(
      e.join(outdeg, "src").repartition(col("src")))
    Checkpoints.release(e)
    // loop-shape selection — the [[pageRank]] regime rule: broadcast
    // shape while the smaller round-join side fits the planner's
    // broadcast threshold, explicit co-partitioned merge shape above it
    val spark = edges.sparkSession
    val pinned = !Checkpoints.broadcastRegime(spark,
      Checkpoints.planStats(nodes).min(Checkpoints.planStats(eDeg0)))
    val parts = Checkpoints.sizedParts(spark,
      Checkpoints.materializedBytes(eDeg0).getOrElse(Long.MaxValue))
    def mh(df: DataFrame): DataFrame = if (pinned) df.hint("merge") else df
    val eDeg =
      if (!pinned) eDeg0
      else {
        val ed = Checkpoints.checkpoint(eDeg0
          .repartition(parts, col("src")).sortWithinPartitions("src"),
          declare = true)
        Checkpoints.release(eDeg0)
        ed
      }

    val base = 15L * scale / 100L
    var ranks = Checkpoints.checkpoint(declare = pinned, df = {
      val seedRanks = nodes.select(col("node"), col("seed"),
        (col("seed") * scale).as("r"))
      if (pinned) seedRanks.repartition(parts, col("node"))
        .sortWithinPartitions("node")
      else seedRanks
    })
    Checkpoints.release(nodes)
    var rounds = 0
    var converged = false
    while (rounds < iterations && !converged) {
      val contribs = eDeg.join(mh(ranks), eDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      val next = Checkpoints.checkpoint(declare = pinned, df =
        ranks.select(col("node"), col("seed"), col("r").as("rp"))
          .join(mh(contribs), col("node") === contribs("dst"), "left")
          .select(col("node"), col("seed"), col("rp"),
            (col("seed") * base +
              expr("(85 * coalesce(s, 0L)) div 100")).as("r")))
      rounds += 1
      converged = rounds < iterations &&
        next.filter(col("r") =!= col("rp")).limit(1).isEmpty
      Checkpoints.release(ranks)
      ranks = next
    }
    roundsOut.foreach(_.set(rounds))
    Checkpoints.release(eDeg)
    ranks.select(col("node"), col("r").as("rank")).orderBy("node")
  }
}

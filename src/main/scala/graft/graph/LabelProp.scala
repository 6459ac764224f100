package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) — the "which nodes cluster together" complement to connected
  * components: CC finds REACHABILITY groups, LPA finds DENSITY groups
  * inside one component (near-duplicate families, interaction circles,
  * co-purchase communities).
  *
  * Every node starts labeled with its own id; each synchronous round a
  * node adopts the label held by the PLURALITY of its neighbors, ties
  * broken toward the smallest label — fully deterministic (the classic
  * asynchronous/random-order variant is not engine-replayable). A fixed
  * round count makes the result exactly replayable as chained SQL CTEs
  * (the PageRank/KCore oracle pattern), and the loop still exits early
  * at an exact fixed point — an unchanged round makes every further
  * round a no-op, so stopping is output-identical.
  *
  * Scale shape (per round): ONE equi-join of the O(nodes) label table
  * against the edge table on the source key, then a map-side-combined
  * (dst, label) count — the exchange carries label FREQUENCIES, not
  * edges — and an argmax by `min_by` over a (−count, label) struct (the
  * [[graft.operators.TableOps.modePerGroup]] trick: no per-node sort, no
  * rank window). Edge table repartitioned on src ONCE and checkpointed;
  * per-round frames are lineage-truncated and the consumed round's
  * blocks released immediately (the loop-release discipline).
  */
object LabelProp {

  /** Community labels after at most `rounds` synchronous rounds over the
    * UNDIRECTED edge set `edges(aCol, bCol)` (BIGINT ids; both
    * orientations are generated internally, self-loops dropped,
    * parallel edges deduplicated so multiplicity does not vote twice).
    * Output: (node, label), ordered by node. `roundsOut`, when
    * supplied, receives the executed round count.
    *
    * WARM START (r14, the [[PageRank.pageRank]]/[[Hits.hits]] `prior`
    * contract ported to the third fixed-point loop): `prior` (a
    * (node, label) frame — the exact output shape of a previous run)
    * seeds the initial label table instead of the identity labeling.
    * Each synchronous round is a pure function of the label table, so
    * continuing j rounds from a round-k table is EXACTLY rounds
    * k+1..k+j of the cold run — after a small edge delta, labels are
    * near the old communities and the exact early stop exits in
    * one-or-few rounds instead of re-walking the cold trajectory.
    * Nodes absent from `prior` (new in the delta'd edge set) start
    * cold (label = own id); prior rows for vanished nodes are ignored
    * (the node set always derives from the edges); duplicate prior
    * nodes RAISE (two labels for one node has no right answer). */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int,
                       roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None,
                       prior: Option[DataFrame] = None): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e0 = edges.select(col(aCol).cast(LongType).as("s"),
      col(bCol).cast(LongType).as("d"))
    val eRaw = Checkpoints.checkpoint(
      e0.union(e0.select(col("d").as("s"), col("s").as("d")))
        .filter(col("s") =!= col("d"))
        .distinct()
        .repartition(col("s")))
    // loop-shape selection — the [[PageRank.pageRank]] regime rule:
    // broadcast shape while the label table fits the planner's broadcast
    // threshold, explicit co-partitioned pre-sorted merge shape above it
    // (per round: zero broadcasts, zero edge exchanges/sorts — only the
    // vote-count aggregation's exchange, the shuffle LPA fundamentally
    // needs; the exchange carries label frequencies, never edges)
    val spark = edges.sparkSession
    val pinned = !Checkpoints.broadcastRegime(spark,
      Checkpoints.planStats(eRaw))
    val parts = Checkpoints.sizedParts(spark,
      Checkpoints.materializedBytes(eRaw).getOrElse(Long.MaxValue))
    def mh(df: DataFrame): DataFrame = if (pinned) df.hint("merge") else df
    val e =
      if (!pinned) eRaw
      else {
        val ep = Checkpoints.checkpoint(eRaw
          .repartition(parts, col("s")).sortWithinPartitions("s"),
          declare = true)
        Checkpoints.release(eRaw)
        ep
      }
    val nodes = e.select(col("s").as("node")).distinct()
    def pinN(df: DataFrame): DataFrame =
      if (pinned) df.repartition(parts, col("node")).sortWithinPartitions("node")
      else df
    var labels = Checkpoints.checkpoint(declare = pinned, df = pinN(prior match {
      case Some(p) =>
        require(p.columns.contains("node") && p.columns.contains("label"),
          "prior must carry (node, label) — the labelPropagation output shape")
        // de-fan BEFORE the seed join (the PageRank.prior discipline): a
        // duplicate node row would row-multiply the label frame through
        // the left join; duplicates RAISE instead of being min'd away
        val p1 = p.select(col("node"), col("label").cast(LongType).as("__pl"))
          .groupBy("node")
          .agg(max("__pl").as("__pl"), count(lit(1)).as("__pn"))
          .select(col("node"),
            when(col("__pn") === 1L, col("__pl"))
              .otherwise(raise_error(format_string(
                "labelPropagation: prior has %s rows for node %s — " +
                  "(node, label) must be unique", col("__pn").cast("string"),
                col("node").cast("string")))).as("__pl"))
        nodes.join(p1, Seq("node"), "left")
          .select(col("node"), coalesce(col("__pl"), col("node")).as("lbl"))
      case None =>
        nodes.select(col("node"), col("node").as("lbl"))
    }))
    var executed = 0
    var converged = false
    while (executed < rounds && !converged) {
      val votes = e.join(mh(labels), e("s") === labels("node"))
        .groupBy(col("d"), col("lbl")).agg(count(lit(1)).as("c"))
      val next = Checkpoints.checkpoint(declare = pinned, df =
        mh(votes.groupBy(col("d"))
          .agg(min_by(col("lbl"),
            struct((-col("c")).as("nc"), col("lbl").as("l"))).as("nl"))
          .select(col("d").as("node"), col("nl")))
          .join(labels.select(col("node"), col("lbl").as("lp")), Seq("node"))
          .select(col("node"), col("lp"), col("nl").as("lbl")))
      executed += 1
      // exact fixed point: an unchanged labeling is stable forever under
      // the synchronous plurality rule — one limit-1 scan of the
      // materialized checkpoint (never a probabilistic signature)
      converged = executed < rounds &&
        next.filter(col("lbl") =!= col("lp")).limit(1).isEmpty
      Checkpoints.release(labels)
      labels = next
    }
    roundsOut.foreach(_.set(executed))
    Checkpoints.release(e)
    labels.select(col("node"), col("lbl").as("label")).orderBy("node")
  }
}

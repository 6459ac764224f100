package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Hierarchy flattening — the transitive ancestor closure of a
  * parent-child relation, bounded by depth: the dimension-modeling
  * primitive behind "roll this category tree / org chart / account
  * hierarchy up to any level" (one closure table replaces recursive
  * point lookups at query time).
  *
  * Frontier propagation on the DIRECTED child→parent relation (the
  * [[Centrality]] discipline): round r joins only the ancestors first
  * reached at depth r−1 against the once-partitioned edge checkpoint,
  * anti-joins the accumulated closure — so each (node, ancestor) pair
  * carries its MINIMUM depth (on a tree, its only depth), diamonds in a
  * DAG dedupe instead of multiplying, and an empty frontier stops the
  * loop with an exact certificate. A node that reaches ITSELF — a
  * cycle, which no hierarchy may contain and which would otherwise
  * loop silently until maxDepth — raises with the offending node id.
  */
object Hierarchy {

  /** (node, anc, depth) for every ancestor within `maxDepth` levels —
    * depth 1 = the parent itself. Rows with NULL child or parent are
    * dropped (a NULL parent terminates a chain, the root convention).
    * Ordered by (node, depth, anc); `roundsOut` observes executed
    * rounds. */
  def ancestors(edges: DataFrame, childCol: String, parentCol: String,
                maxDepth: Int,
                roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 64,
      s"maxDepth must be in [1, 64], got $maxDepth")
    val pc = Checkpoints.checkpoint(
      edges.select(col(childCol).cast(LongType).as("c"),
          col(parentCol).cast(LongType).as("p"))
        .filter(col("c").isNotNull && col("p").isNotNull)
        .distinct().repartition(col("c")))
    def guardCycle(node: org.apache.spark.sql.Column,
                   anc: org.apache.spark.sql.Column) =
      when(node =!= anc, anc).otherwise(raise_error(format_string(
        "ancestors: node %s is its own ancestor — the relation has a cycle",
        node)))
    var all = Checkpoints.checkpoint(
      pc.select(col("c").as("node"), guardCycle(col("c"), col("p")).as("anc"),
        lit(1L).as("depth")))
    var frontier = all
    var rounds = 1
    var exhausted = false
    while (rounds < maxDepth && !exhausted) {
      val fresh = Checkpoints.checkpoint(
        frontier.join(pc, frontier("anc") === pc("c"))
          .select(col("node"), guardCycle(col("node"), col("p")).as("anc"),
            (col("depth") + 1L).as("depth"))
          .groupBy("node", "anc").agg(min("depth").as("depth"))
          .join(all.select(col("node"), col("anc")),
            Seq("node", "anc"), "left_anti"))
      rounds += 1
      exhausted = fresh.limit(1).isEmpty
      if (!exhausted) {
        val nextAll = Checkpoints.checkpoint(all.unionByName(fresh))
        Checkpoints.release(all)
        if (frontier ne all) Checkpoints.release(frontier)
        all = nextAll
        frontier = fresh
      } else {
        Checkpoints.release(fresh)
        if (frontier ne all) Checkpoints.release(frontier)
      }
    }
    roundsOut.foreach(_.set(rounds))
    Checkpoints.release(pc)
    all.orderBy("node", "depth", "anc")
  }

  /** Subtree rollup — per hierarchy node, the count and sum of every
    * fact attached at or below it: total(a) = Σ facts over {key : a ∈
    * ancestors*(key) ∪ {key}}. The "roll sales up the category tree"
    * query, answered from the [[ancestors]] closure instead of a
    * recursive walk per node. Output: (node, n_rows, total), one row per
    * node with ≥ 1 fact in its subtree, ordered.
    *
    * Scale shape: facts pre-aggregate to O(distinct keys) FIRST — the
    * closure join fans out aggregated rows ×O(depth), never raw facts —
    * then one groupBy on the ancestor. Every fact key contributes to
    * itself (depth 0) even when it never appears in `edges` (a leaf-only
    * or orphan key still rolls up to itself). NULL keys/values drop. */
  def rollupSum(edges: DataFrame, childCol: String, parentCol: String,
                maxDepth: Int, facts: DataFrame, keyCol: String,
                valueCol: String): DataFrame = {
    val perNode = facts.select(col(keyCol).cast(LongType).as("node"),
        col(valueCol).cast(LongType).as("v"))
      .filter(col("node").isNotNull && col("v").isNotNull)
      .groupBy("node")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("total"))
    val membership = ancestors(edges, childCol, parentCol, maxDepth)
      .select(col("node"), col("anc"))
      .unionByName(perNode.select(col("node"), col("node").as("anc")))
    membership.join(perNode, Seq("node"))
      .groupBy(col("anc").as("node"))
      .agg(sum("n_rows").as("n_rows"), sum("total").as("total"))
      .orderBy("node")
  }
}

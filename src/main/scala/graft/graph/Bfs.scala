package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Multi-source shortest paths over an undirected graph — hop distance
  * (reachability radius, influence spread, "how far is every product
  * from the promoted set") and its weighted generalization (cheapest
  * route, latency propagation, cost-to-serve).
  *
  * Synchronous label-relaxation rounds (Bellman-Ford): each round the
  * current distance table joins the edge set once, relaxed labels
  * min-combine map-side, and the frame is lineage-truncated through
  * [[Checkpoints.checkpoint]] — the per-round exchange is the O(nodes)
  * label table, the edge table is oriented both ways, partitioned once
  * and reused (the CC/PageRank loop discipline). The bounded round
  * count makes the result — cheapest cost over paths of at most
  * `maxRounds` edges, unreachable nodes absent — exactly replayable as
  * chained SQL CTEs, and bounds the cost on adversarial diameters. The
  * loop still exits early at an exact fixed point (a round that relaxes
  * nothing can never relax anything later — non-negative weights — so
  * stopping is output-identical and the oracle replays unchanged).
  */
object Bfs {

  /** Hop distance from `sources` (a frame with BIGINT column `srcNode`)
    * over the undirected graph `edges`, exploring at most `maxHops`
    * rounds — exactly [[shortestPaths]] with unit weights. Output:
    * (node, dist) for every node within reach, ordered by node; sources
    * not present in the edge set still appear at dist 0. */
  def hopDistance(edges: DataFrame, aCol: String, bCol: String,
                  sources: DataFrame, srcNode: String,
                  maxHops: Int): DataFrame =
    shortestPaths(edges, aCol, bCol, None, sources, srcNode, maxHops)

  /** Multi-source WEIGHTED shortest paths: cheapest total weight from
    * any source over paths of at most `maxRounds` edges. `wCol` is a
    * non-negative BIGINT edge weight (negative weights raise — a
    * hop-bounded "shortest" path under negative weights is a trap for
    * the caller, not a distance); `None` means unit weights. Parallel
    * edges collapse to their minimum weight BEFORE the loop (one
    * map-side-combined aggregation), so a multigraph costs the same per
    * round as its simple reduction. Output: (node, dist), ordered by
    * node; `roundsOut`, when supplied, receives the executed rounds. */
  def shortestPaths(edges: DataFrame, aCol: String, bCol: String,
                    wCol: Option[String],
                    sources: DataFrame, srcNode: String,
                    maxRounds: Int,
                    roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val w0 = wCol.map(c => col(c).cast(LongType)).getOrElse(lit(1L))
    val w = when(w0 >= 0, w0).otherwise(raise_error(
      format_string("shortestPaths: negative edge weight %s", w0)))
    val e0 = edges.select(col(aCol).cast(LongType).as("s"),
      col(bCol).cast(LongType).as("d"), w.as("w"))
    val eRaw = Checkpoints.checkpoint(
      e0.union(e0.select(col("d").as("s"), col("s").as("d"), col("w")))
        .filter(col("s") =!= col("d"))
        .groupBy("s", "d").agg(min("w").as("w"))
        .repartition(col("s")))
    // loop-shape selection — the [[PageRank.pageRank]] regime rule:
    // broadcast shape while the smaller round-join side fits the
    // planner's broadcast threshold, explicit co-partitioned pre-sorted
    // merge shape above it (per round: zero broadcasts, zero edge
    // exchanges/sorts — only the min-combine aggregation's exchange,
    // the shuffle Bellman-Ford fundamentally needs)
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
    var dist = Checkpoints.checkpoint(declare = pinned, df = {
      val seed = sources.select(col(srcNode).cast(LongType).as("node"),
        lit(0L).as("dist")).distinct()
      if (pinned) seed.repartition(parts, col("node"))
        .sortWithinPartitions("node")
      else seed
    })
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val relaxed = e.join(mh(dist), e("s") === dist("node"))
        .select(col("d").as("node"), (col("dist") + col("w")).as("dist"))
      val prev = dist
      val combined = prev.select("node", "dist").union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      // carry the previous round's distance beside the new one so the
      // fixed-point test is one limit-1 scan of the materialized frame
      dist = Checkpoints.checkpoint(declare = pinned, df =
        combined.join(mh(prev.select(col("node"), col("dist").as("dp"))),
          Seq("node"), "left"))
      rounds += 1
      // exact fixed point: nothing new reached and nothing improved —
      // with non-negative weights no later round can differ
      converged = rounds < maxRounds &&
        dist.filter(col("dp").isNull || col("dist") < col("dp")).limit(1).isEmpty
      // free the consumed round's label blocks (loop-release discipline:
      // without it every round's full label table stays pinned at once)
      Checkpoints.release(prev)
    }
    roundsOut.foreach(_.set(rounds))
    // the final dist checkpoint is eager, so nothing downstream recomputes
    // through the edge frame — release it too (PageRank/KCore discipline)
    Checkpoints.release(e)
    dist.select(col("node"), col("dist")).orderBy("node")
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Multi-source breadth-first hop distance — reachability radius,
  * influence spread, "how far is every product from the promoted set".
  *
  * Synchronous label-relaxation rounds (Bellman-Ford with unit weights):
  * each round the current distance table joins the edge set once, relaxed
  * labels min-combine map-side, and the frame is lineage-truncated
  * through [[Checkpoints.checkpoint]] — the per-round exchange is the
  * O(nodes) label table, the edge table is oriented both ways,
  * partitioned once and reused (the CC/PageRank loop discipline). The
  * round count equals `maxHops`, making the result — distances capped at
  * `maxHops` hops, unreachable nodes absent — exactly replayable as
  * chained SQL CTEs, and bounding the cost on adversarial diameters.
  */
object Bfs {

  /** Hop distance from `sources` (a frame with BIGINT column `srcNode`)
    * over the undirected graph `edges`, exploring at most `maxHops`
    * rounds. Output: (node, dist) for every node within reach, ordered
    * by node; sources not present in the edge set still appear at
    * dist 0. */
  def hopDistance(edges: DataFrame, aCol: String, bCol: String,
                  sources: DataFrame, srcNode: String,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e0 = edges.select(col(aCol).cast(LongType).as("s"),
      col(bCol).cast(LongType).as("d"))
    val e = Checkpoints.checkpoint(
      e0.union(e0.select(col("d").as("s"), col("s").as("d")))
        .filter(col("s") =!= col("d"))
        .distinct()
        .repartition(col("s")))
    var dist = Checkpoints.checkpoint(
      sources.select(col(srcNode).cast(LongType).as("node"),
        lit(0L).as("dist")).distinct())
    for (_ <- 1 to maxHops) {
      val relaxed = e.join(dist, e("s") === dist("node"))
        .select(col("d").as("node"), (col("dist") + 1L).as("dist"))
      val prev = dist
      dist = Checkpoints.checkpoint(
        prev.union(relaxed).groupBy("node").agg(min("dist").as("dist")))
      // free the consumed round's label blocks (loop-release discipline:
      // without it every round's full label table stays pinned at once)
      Checkpoints.release(prev)
    }
    // the final dist checkpoint is eager, so nothing downstream recomputes
    // through the edge frame — release it too (loop-release discipline:
    // PageRank releases eDeg/nodes, KCore releases each peeled round)
    Checkpoints.release(e)
    dist.orderBy("node")
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** k-core decomposition by iterative peeling: repeatedly remove every
  * node with degree < k (and its edges) until the graph stabilizes — the
  * surviving subgraph is the k-core, the standard density filter for
  * spam/bot subgraph mining and community seeding (a node in the k-core
  * has ≥ k neighbors that THEMSELVES survive the same test).
  *
  * Each peel round: one degree aggregation (map-side combined) + two
  * semi joins restricting the edge set to surviving endpoints — all
  * keyed exchanges on node ids; the edge frame is lineage-truncated
  * through [[Checkpoints.checkpoint]] every round (the CC/PageRank loop
  * discipline). Rounds needed = peeling depth, usually ≪ diameter; the
  * `maxPeels` bound makes the round count — and therefore an exact SQL
  * replay of the peels — deterministic. Convergence inside the bound is
  * detected by edge count and stops the loop (further peels are no-ops,
  * so a bounded replay still matches).
  */
object KCore {

  /** Nodes of the `k`-core approximant after at most `maxPeels` peeling
    * rounds of the undirected graph `edges` (self-loops dropped,
    * duplicates/orientation collapsed). With `maxPeels` ≥ the peeling
    * depth this IS the exact k-core. Output: (node, degree) — degree
    * within the surviving subgraph — ordered by node. */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
            k: Int, maxPeels: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxPeels >= 1, "maxPeels must be >= 1")
    var e = Checkpoints.checkpoint(
      edges.select(
          least(col(aCol), col(bCol)).cast(LongType).as("a"),
          greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    var nEdges = e.count()
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged && rounds < maxPeels) {
      val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("n")
      val prev = e
      e = Checkpoints.checkpoint(
        prev.join(keep.select(col("n").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("n").as("b")), Seq("b"), "left_semi")
          .select("a", "b"))
      // the new round's frame is materialized (eager checkpoint); the
      // previous round's blocks are dead weight — without this release a
      // deep peel pins every round's full edge set at once (measured
      // executor OOM at 10M edges × 5 rounds)
      Checkpoints.release(prev)
      val nNow = e.count()
      converged = nNow == nEdges
      nEdges = nNow
      rounds += 1
    }
    e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("degree"))
      .orderBy("n")
  }
}

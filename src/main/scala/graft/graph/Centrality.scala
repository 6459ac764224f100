package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Seed-set centrality: per-seed BFS distances and harmonic centrality —
  * "how well does each of THESE nodes reach the graph" (facility
  * placement, influencer audit, coverage scoring). The per-seed form is
  * what [[Bfs.hopDistance]] deliberately is not: hopDistance collapses
  * to min-over-any-seed (one label per node), while centrality needs
  * every (seed, node) distance pair.
  *
  * Harmonic centrality — Σ 1/d(seed, v), the closeness variant defined
  * on disconnected graphs (Boldi & Vigna, "Axioms for Centrality",
  * Internet Math 2014) — is emitted as an EXACT fraction: with
  * L = lcm(1..maxHops), every reachable node contributes the exact
  * integer L/d, so `harm_num/harm_den` carries no float and no
  * truncation at all (L is divisible by every d ≤ maxHops), and any
  * engine replays it cell-for-cell.
  *
  * Scale shape: the label table is O(|seeds| · reached) — per-seed
  * centrality is inherently a |seeds|-fold labeling, so the seed set is
  * the scale knob (score a candidate set, not every node; for
  * all-nodes centrality use sketch methods — out of scope, and never
  * silently approximated here). Per round: ONE equi-join of the
  * FRONTIER (only last round's fresh labels — unit weights mean a
  * node's first label is final) against the once-partitioned
  * bidirectional edge checkpoint, one map-side-combined min, one
  * anti-join against the accumulated labels — the [[Bfs]] loop
  * discipline with checkpoint-and-release each round, stopping exactly
  * when a frontier comes back empty (an empty frontier can never label
  * again — a deterministic certificate, not a signature). */
object Centrality {

  /** (seed, node, dist) for every node within `maxHops` of each seed —
    * hop distance per seed over the undirected graph, seeds at dist 0 of
    * themselves (seeds absent from the edge set still appear there).
    * Ordered by (seed, node); `roundsOut` observes executed rounds. */
  def perSeedDistances(edges: DataFrame, aCol: String, bCol: String,
                       seeds: DataFrame, seedCol: String, maxHops: Int,
                       roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e0 = edges.select(col(aCol).cast(LongType).as("s"),
      col(bCol).cast(LongType).as("d"))
    val eRaw = Checkpoints.checkpoint(
      e0.union(e0.select(col("d").as("s"), col("s").as("d")))
        .distinct().repartition(col("s")))
    // loop-shape selection — the [[PageRank.pageRank]] regime rule: the
    // expansion join broadcasts the frontier while it fits; above the
    // threshold the edge table is re-laid ONCE as an explicit-N
    // hash-partitioned pre-sorted checkpoint so no round ever exchanges,
    // sorts, or broadcasts the edges
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
    // FRONTIER propagation, not Bellman-Ford: with unit weights a node's
    // FIRST label is its final distance, so each round relaxes only the
    // nodes labeled last round — the expansion join is O(frontier·deg),
    // not O(all-labels·deg), and on a dense graph the late rounds (tiny
    // frontier, most nodes already labeled) become nearly free instead
    // of the most expensive. The weighted case genuinely needs the
    // full-table relaxation and lives in [[Bfs.shortestPaths]].
    var all = Checkpoints.checkpoint(
      seeds.select(col(seedCol).cast(LongType).as("seed")).distinct()
        .select(col("seed"), col("seed").as("node"), lit(0L).as("dist")))
    var frontier = all
    var rounds = 0
    var exhausted = false
    while (rounds < maxHops && !exhausted) {
      val fresh = Checkpoints.checkpoint(
        mh(frontier).join(e, frontier("node") === e("s"))
          .select(col("seed"), col("d").as("node"),
            (col("dist") + 1L).as("dist"))
          .groupBy("seed", "node").agg(min("dist").as("dist"))
          .join(all.select(col("seed"), col("node")),
            Seq("seed", "node"), "left_anti"))
      rounds += 1
      // exact stop: an empty frontier can never produce labels again
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
    Checkpoints.release(e)
    all.orderBy("seed", "node")
  }

  /** Per-seed harmonic centrality within `maxHops`: (seed, n_reached,
    * harm_num, harm_den) with harm_num = Σ_{0 < d(seed,v) ≤ maxHops} L/d
    * and harm_den = L = lcm(1..maxHops) — an exact fraction, zero for
    * seeds reaching nothing (every seed appears). `maxHops` ≤ 20 keeps
    * L·reached inside Int64 headroom. Ordered by seed. */
  def harmonicCentrality(edges: DataFrame, aCol: String, bCol: String,
                         seeds: DataFrame, seedCol: String,
                         maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 20,
      s"maxHops must be in [1, 20] (lcm/Int64 headroom), got $maxHops")
    val L = (1 to maxHops).foldLeft(1L)((acc, i) => lcm(acc, i.toLong))
    val seedTbl = seeds.select(col(seedCol).cast(LongType).as("seed")).distinct()
    val scores = perSeedDistances(edges, aCol, bCol, seedTbl, "seed", maxHops)
      .filter(col("dist") > 0)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"),
        sum(expr(s"$L div dist")).as("harm_num"))
    seedTbl.join(scores, Seq("seed"), "left")
      .select(col("seed"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"),
        coalesce(col("harm_num"), lit(0L)).as("harm_num"),
        lit(L).as("harm_den"))
      .orderBy("seed")
  }

  private def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b
  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}

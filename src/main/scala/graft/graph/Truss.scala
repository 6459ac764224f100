package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** k-truss — the EDGE-cohesion subgraph: keep every edge supported by at
  * least (k−2) triangles, peel, recount, repeat. Where [[KCore]] answers
  * "nodes with enough neighbors" (degree cohesion), the truss answers
  * "edges embedded in enough mutual triangles" — the standard
  * community-core / spam-edge filter one notch stronger than the core
  * (every k-truss is inside the (k−1)-core, not vice versa).
  *
  * Per peel round: ONE triangle enumeration over the surviving edge set
  * ([[Triangles.triangles]] — degree-ordered orientation, so a hub
  * generates no wedges and per-round work is O(Σ outdeg²) ≤ O(m^1.5)
  * regardless of skew), an explode of each triangle into its three
  * edges, one map-side-combined support count, one keyed left join +
  * filter. Edges are only ever REMOVED, so an unchanged edge count is
  * an exact no-op certificate (the KCore stop discipline) and stopping
  * early is output-identical to running all `maxPeels` rounds — a
  * chained-CTE oracle replays unchanged. `maxPeels` bounds adversarial
  * peel chains exactly like KCore's bound: the result after p peels is
  * a documented, replayable object ("the p-round k-truss approximant"),
  * converged or not; `roundsOut` reports executed rounds.
  */
object Truss {

  /** Surviving canonical edges (a < b) of the k-truss approximant after
    * at most `maxPeels` peel rounds over the undirected graph `edges`
    * (self-loops dropped, duplicates/orientation collapsed). Output
    * (a, b), ordered. */
  def kTruss(edges: DataFrame, aCol: String, bCol: String, k: Int,
             maxPeels: Int,
             roundsOut: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k = 2 keeps every edge), got $k")
    require(maxPeels >= 1, s"maxPeels must be >= 1, got $maxPeels")
    var e = Checkpoints.checkpoint(
      edges.select(
          least(col(aCol), col(bCol)).cast(LongType).as("a"),
          greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    var nEdges = e.count() // O(1) driver scalar off the materialized frame
    var rounds = 0
    var converged = false
    while (rounds < maxPeels && !converged && nEdges > 0) {
      val tri = Triangles.triangles(e, "a", "b")
      val sup = tri.select(explode(array(
          struct(col("a"), col("b")),
          struct(col("a").as("a"), col("c").as("b")),
          struct(col("b").as("a"), col("c").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
      val kept = Checkpoints.checkpoint(
        e.join(sup, Seq("a", "b"), "left")
          .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
          .select(col("a"), col("b")))
      rounds += 1
      val nKept = kept.count()
      // edges only disappear: an unchanged count proves a no-op round
      converged = nKept == nEdges
      nEdges = nKept
      Checkpoints.release(e)
      e = kept
    }
    roundsOut.foreach(_.set(rounds))
    e.orderBy("a", "b")
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Checkpoints

/** Neighborhood-overlap link prediction — "which non-edges look most like
  * edges": candidate recommendation, knowledge-graph completion, missing-
  * interaction detection. For every NON-adjacent pair at distance 2 it
  * scores the overlap of the endpoints' neighborhoods: common-neighbor
  * count and neighborhood Jaccard, both as EXACT integers/fractions (the
  * float-free convention of [[Triangles.clusteringCoefficient]]) so any
  * engine replays cell-for-cell.
  *
  * Hub guard (the 100 TB design point): wedge generation through a center
  * node is quadratic in its degree, and a 10M-degree hub both hands one
  * task a 10M² join AND carries near-zero predictive signal (everyone is
  * "similar" through it — the reason practical systems discount or drop
  * super-connectors, cf. Adamic–Adar's 1/log(deg) damping). This operator
  * makes the guard EXPLICIT and semantic: only nodes with degree ≤
  * `maxDegree` act as connectors, and ALL outputs (common count, Jaccard
  * numerator AND denominator) are defined over the capped-connector
  * neighborhoods `Ncap(v) = {u adjacent to v : deg(u) ≤ maxDegree}` — a
  * self-consistent graph semantics, not a silently-approximated full
  * Jaccard. Per-center wedge work is then ≤ maxDegree², so the whole pass
  * is O(n·maxDegree²) worst-case regardless of skew.
  *
  * Exchanges: the canonical-edge checkpoint feeds the degree aggregate,
  * the capped-neighbor build, and the non-adjacency anti-join (Spark does
  * no cross-branch CSE — the [[Triangles]] lesson); the wedge self-join
  * and the count aggregation are equi-keyed on the center / pair.
  */
object LinkPredict {

  /** Scores every non-adjacent pair of the undirected graph `edges`
    * (endpoints cast to BIGINT; self-loops dropped, duplicates and
    * orientation collapsed) that shares at least `minCommon` capped
    * connectors. Output (a, b, common, jaccard_den) with a < b, where
    * `common = |Ncap(a) ∩ Ncap(b)|` and
    * `jaccard_den = |Ncap(a)| + |Ncap(b)| − common = |Ncap(a) ∪ Ncap(b)|`
    * — the Jaccard score is `common / jaccard_den`, left as an exact
    * fraction. Ordered by (a, b). */
  def commonNeighbors(edges: DataFrame, aCol: String, bCol: String,
                      maxDegree: Int, minCommon: Long = 1L): DataFrame = {
    require(maxDegree >= 1, "maxDegree must be >= 1")
    require(minCommon >= 1L, "minCommon must be >= 1")
    val e = Checkpoints.checkpoint(
      edges.select(
          least(col(aCol), col(bCol)).cast(LongType).as("a"),
          greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // (center u, endpoint x) for every capped connector u — per-center
    // fan-out ≤ maxDegree by construction, so the wedge join below is
    // skew-proof; materialized once for its two self-join sides + the
    // capped-degree aggregate
    val nbrs = Checkpoints.checkpoint(
      e.select(col("a").as("u"), col("b").as("x"))
        .union(e.select(col("b").as("u"), col("a").as("x")))
        .join(deg.filter(col("d") <= maxDegree).select(col("n").as("u")), "u"))
    val dcap = nbrs.groupBy(col("x")).agg(count(lit(1)).as("dc"))
    val wedges = nbrs.select(col("u"), col("x").as("pa"))
      .join(nbrs.select(col("u"), col("x").as("pb")), Seq("u"))
      .filter(col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    val nonAdjacent = wedges.join(e,
      wedges("pa") === e("a") && wedges("pb") === e("b"), "left_anti")
    nonAdjacent
      .join(dcap.select(col("x").as("pa"), col("dc").as("dca")), "pa")
      .join(dcap.select(col("x").as("pb"), col("dc").as("dcb")), "pb")
      .select(col("pa").as("a"), col("pb").as("b"), col("common"),
        (col("dca") + col("dcb") - col("common")).as("jaccard_den"))
      .orderBy("a", "b")
  }
}

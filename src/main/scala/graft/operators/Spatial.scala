package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Grid-bucketed spatial self-join — all point pairs within a radius,
  * without the all-pairs cross join. The classic fixed-grid spatial-join
  * shape (e.g. Zhang et al., "Spatial Queries... on MapReduce", and the
  * grid variant in Spark's own range-join literature): bucket the plane
  * into cells of width = radius; any two points within the radius land
  * in the SAME or ADJACENT cells (|Δx| ≤ r ⇒ floor-cell coords differ by
  * ≤ 1), so candidates come from an equi-join of one side's home cell
  * against the other side exploded to its 3×3 cell neighborhood — a
  * constant ×9 fan-out of points, never ×points. Each qualifying pair
  * joins EXACTLY once (the probe's home cell is a single key; only one
  * of the builder's nine neighbor copies carries it), so no
  * dedup-distinct pass is needed.
  */
object Spatial {

  /** All pairs (id_a < id_b) of `points` with squared Euclidean distance
    * ≤ radius². Integer coordinates, exact integer dist² output —
    * (id_a, id_b, dist2), ordered. Rows with a NULL id or coordinate are
    * dropped; ids must be unique (pairs are keyed by them).
    *
    * Scale shape: shuffle is keyed on the (cx, cy) grid cell — pick
    * `radius` so a cell holds O(1)–O(100) points; a cell with k points
    * does k² candidate work, so heavy point clustering should shrink the
    * radius (or pre-aggregate coincident points) rather than rely on
    * AQE skew splitting alone. Int64 exactness is structural: dist² is
    * only ever computed for same-or-adjacent-cell pairs, where
    * |Δx|, |Δy| ≤ 2·radius, so dist² ≤ 8·radius² — radius ≤ 1e9 keeps
    * it exact for ANY coordinates (enforced). */
  def radiusJoin(points: DataFrame, idCol: String, xCol: String,
                 yCol: String, radius: Long): DataFrame =
    candidates(points, idCol, xCol, yCol, radius)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("dist2"))
      .orderBy("id_a", "id_b")

  /** For every point, its nearest OTHER point within `radius` — the
    * bounded-radius nearest-neighbor join (entity resolution's "closest
    * candidate", geo's "nearest store"). Same grid machinery as
    * [[radiusJoin]]; the per-point argmin is ONE min(struct(dist2, id))
    * aggregate, so ties break on the smaller neighbor id
    * deterministically. Points with no neighbor within the radius are
    * OMITTED (the bounded contract — an unbounded exact NN needs
    * expanding-ring search, deliberately out of scope). Output:
    * (id, nn_id, dist2), ordered by id. */
  def nearestNeighbor(points: DataFrame, idCol: String, xCol: String,
                      yCol: String, radius: Long): DataFrame = {
    // two plain-min HASH aggregations + one keyed join instead of one
    // min(struct(...)): a struct min can't use a mutable HashAggregate
    // buffer, so Spark plans SortAggregate — measured 2× slower from
    // double-sorting every candidate row. The candidate table feeds both
    // phases, so it is checkpointed once (released by the caller's
    // releaseAll cycle).
    val cand = Checkpoints.checkpoint(
      candidates(points, idCol, xCol, yCol, radius)
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_b").as("id"), col("id_a"), col("dist2")))
    val best = cand.groupBy("id").agg(min("dist2").as("dist2"))
    cand.join(best, Seq("id", "dist2"))
      .groupBy("id").agg(min("id_a").as("nn_id"), min("dist2").as("dist2"))
      .select(col("id"), col("nn_id"), col("dist2"))
      .orderBy("id")
  }

  /** The shared grid candidate generator: all (a, b) point pairs in the
    * same or adjacent cells with dist² ≤ radius², each pair ONCE per
    * direction (b's home cell is a single key; exactly one of a's nine
    * neighbor copies carries it). */
  private def candidates(points: DataFrame, idCol: String, xCol: String,
                         yCol: String, radius: Long): DataFrame = {
    require(radius >= 1 && radius <= 1000000000L,
      s"radius must be in [1, 1e9] (Int64 dist-squared bound), got $radius")
    val pts = points.select(col(idCol).cast(LongType).as("id"),
        col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
      .filter(col("id").isNotNull && col("x").isNotNull && col("y").isNotNull)
    // floor division valid for negatives: pmod keeps the remainder
    // non-negative, so (v - pmod(v, r)) div r == floor(v / r)
    def cell(c: String) = expr(s"($c - pmod($c, ${radius}L)) div ${radius}L")
    val home = pts
      .withColumn("cx", cell("x")).withColumn("cy", cell("y"))
    val probe = home.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val build = home.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(expr("sequence(-1L, 1L)")).as("dx"), col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("dx")).as("cx"),
        explode(expr("sequence(-1L, 1L)")).as("dy"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"), col("cx"),
        (col("cy") + col("dy")).as("cy"))
    val r2 = radius * radius
    build.join(probe, Seq("cx", "cy"))
      .withColumn("dist2",
        (col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")))
      .filter(col("dist2") <= r2)
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Newman modularity per community, as EXACT integer fractions — the
  * quality score for a community assignment (LPA's labels, a CC
  * clustering, an external partition): how many more intra-community
  * edges exist than a degree-preserving random graph would put there.
  *
  * Q = Σ_c [ e_c/m − (d_c/2m)² ] with m = |edges|, e_c = intra-community
  * edges, d_c = Σ degree over the community. Per community this is the
  * exact fraction q_num_c / q_den = (4·m·e_c − d_c²) / 4m² — integer
  * arithmetic end to end (float modularity drifts with combine order;
  * the fractions sum to Q in whatever precision the caller wants).
  * Int64 bound: 4m² must fit, so m ≤ 1.5·10⁹ edges (enforced) —
  * beyond that, scale the fraction by gcd or move to decimal.
  *
  * Shape: edges canonicalize + distinct once; degrees are one
  * aggregation; the label table joins to degrees (per-community sums)
  * and to BOTH edge endpoints (intra count) — three keyed joins and
  * three aggregations, nothing quadratic; m reduces to ONE driver Long
  * (the Association pattern — a constant-key scalar join would
  * constant-fold to a banned nested-loop cross). */
object Modularity {

  /** Output: (label, n_nodes, deg_sum, intra_edges, q_num, q_den)
    * ordered by label. `labels` must cover the edge-connected nodes
    * (exactly what [[LabelProp.labelPropagation]] emits); labeled
    * isolated nodes contribute nothing to Q and are dropped by the
    * degree join. */
  def perCommunity(edges: DataFrame, aCol: String, bCol: String,
                   labels: DataFrame, nodeCol: String = "node",
                   labelCol: String = "label"): DataFrame = {
    // the canonical edge set feeds THREE consumers (m count, degrees,
    // intra join) — Spark does no cross-branch CSE, so materialize once
    // (the Triangles shared-checkpoint lesson)
    val e = graft.operators.Checkpoints.checkpoint(
      edges.select(
          least(col(aCol), col(bCol)).cast(LongType).as("a"),
          greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val m = e.count()
    require(m <= 1500000000L,
      s"modularity denominator 4m^2 overflows Int64 at m=$m edges")
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // a node labeled twice would double-count its degree and intra edges
    // — dedupe defensively (LPA emits each node once; external label
    // tables may not)
    val lab = labels.select(col(nodeCol).cast(LongType).as("n"),
      col(labelCol).as("label")).distinct()
    val comm = lab.join(deg, Seq("n"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("deg_sum"))
    val intra = e
      .join(lab.select(col("n").as("a"), col("label").as("la")), Seq("a"))
      .join(lab.select(col("n").as("b"), col("label").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("intra_edges"))
    comm.join(intra, Seq("label"), "left")
      .select(col("label"), col("n_nodes"), col("deg_sum"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        (lit(4L) * m * coalesce(col("intra_edges"), lit(0L)) -
          col("deg_sum") * col("deg_sum")).as("q_num"),
        lit(4L * m * m).as("q_den"))
      .orderBy("label")
  }
}

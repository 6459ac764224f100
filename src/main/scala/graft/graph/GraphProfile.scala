package graft.graph

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** One-row graph summary — the profiling pass run before choosing graph
  * algorithms and their knobs (degree caps, peel bounds, broadcast
  * thresholds): node/edge counts, exact degree min / lower-median / max,
  * and density as the exact fraction 2m / n(n−1). The degree median is
  * the skew headline: median ≪ max is the power-law signature that
  * decides hub guards ([[LinkPredict]]'s maxDegree, [[Triangles]]'
  * orientation).
  */
object GraphProfile {

  /** Profiles the undirected graph given by `edges` (self-loops dropped,
    * duplicates/orientation collapsed — the [[Triangles]]
    * canonicalization). Output row: (n_nodes, n_edges, min_deg, med_deg,
    * max_deg, density_num, density_den); empty graph → empty frame.
    *
    * Scale shape: one canonical-edge distinct + one degree aggregation;
    * the scalar stats are an O(1) driver collect (the bounded-state
    * class) and the median runs over the FREQUENCY-COMPRESSED degree
    * table — O(distinct degrees) rows, ≪ nodes on any real graph — via
    * the cumulative-rank hit rule, never a partitionless window over
    * nodes. n(n−1) is overflow-guarded (n ≤ 3e9). */
  def profile(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(
        least(col(aCol), col(bCol)).cast(LongType).as("a"),
        greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // the degree table feeds BOTH the scalar stats and the median pass —
    // checkpoint once so the edge distinct doesn't run twice
    val deg = graft.operators.Checkpoints.checkpoint(
      e.select(col("a").as("n")).union(e.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d")))
    val outSchema = StructType(Seq("n_nodes", "n_edges", "min_deg",
      "med_deg", "max_deg", "density_num", "density_den")
      .map(StructField(_, LongType, nullable = false)))
    // O(1) driver scalars off the O(nodes) degree table
    val stats = deg.agg(count(lit(1)), sum("d"), min("d"), max("d")).head
    if (stats.getLong(0) == 0L) {
      graft.operators.Checkpoints.release(deg)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    }
    val (nNodes, mnD, mxD) =
      (stats.getLong(0), stats.getLong(2), stats.getLong(3))
    val m = stats.getLong(1) / 2
    require(nNodes <= 3037000499L, // floor(sqrt(Long.Max))
      s"profile: n(n-1) overflows Int64 at n=$nNodes nodes")
    // lower median over the frequency-compressed degree table: the rank
    // (n+1) div 2 lives in exactly one degree's cumulative span
    val cnts = deg.groupBy("d").agg(count(lit(1)).as("cnt"))
    val medRow = graft.operators.PrefixSum
      .exclusive(cnts, "cnt", "below", numParts = -1, col("d"))
      .filter(col("below") < expr(s"(${nNodes}L + 1) div 2") &&
        expr(s"(${nNodes}L + 1) div 2") <= col("below") + col("cnt"))
      .select("d").head
    val med = medRow.getLong(0)
    graft.operators.Checkpoints.release(deg)
    spark.createDataFrame(
      java.util.Arrays.asList(Row(nNodes, m, mnD, med, mxD,
        2L * m, nNodes * (nNodes - 1L))),
      outSchema)
  }
}

package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Degree assortativity — does the graph wire hubs to hubs (social
  * networks, r > 0) or hubs to leaves (the internet/biology, r < 0)?
  * Newman's r is the Pearson correlation of endpoint degrees over every
  * DIRECTED orientation of every undirected edge; this module stages
  * those (deg_x, deg_y) pairs and delegates the correlation to
  * [[graft.operators.TableOps.corrPairs]] — one operator, one exactness
  * contract (BIGINT power sums = mergeable state, DECIMAL(38,0) moment
  * forms), shared between column statistics and graph structure.
  */
object Assortativity {

  /** One row per directed orientation of each undirected edge (self-loops
    * dropped, duplicate/reversed inputs collapsed first — the
    * [[Triangles]] canonicalization), carrying both endpoint degrees:
    * (x, y, deg_x, deg_y). n_rows = 2·m exactly.
    *
    * Scale shape: one map-side-combined degree aggregation, then two
    * joins keyed on the endpoint id (degree table is O(nodes) — AQE
    * broadcasts it while it fits, shuffles on the key past that); the
    * both-orientations union doubles rows AFTER the degrees are attached
    * to the canonical set, so each join runs over m rows, not 2m. */
  def degreePairs(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(
        least(col(aCol), col(bCol)).cast(LongType).as("a"),
        greatest(col(aCol), col(bCol)).cast(LongType).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("d").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("deg_b")), "b")
    withDeg.select(col("a").as("x"), col("b").as("y"),
        col("deg_a").as("deg_x"), col("deg_b").as("deg_y"))
      .union(withDeg.select(col("b").as("x"), col("a").as("y"),
        col("deg_b").as("deg_x"), col("deg_a").as("deg_y")))
  }

  /** Newman degree assortativity as [[graft.operators.TableOps.corrPairs]]
    * output over the directed-degree pairs: ONE row with n = 2m, the five
    * BIGINT power sums, and exact DECIMAL(38,0) cov_num / var_x / var_y —
    * r = cov_num / √(var_x·var_y), computed downstream in whatever width
    * the caller has (r² and sign are exact from the fractions alone).
    * By symmetry sum_x = sum_y and var_x = var_y (both orientations are
    * present), a free cross-check the spec pins. Int64 bound on the sums:
    * 2m·d̄² under 9.2e18 (the corrPairs contract). */
  def degreeAssortativity(edges: DataFrame, aCol: String,
                          bCol: String): DataFrame =
    graft.operators.TableOps.corrPairs(
      degreePairs(edges, aCol, bCol).select("deg_x", "deg_y"),
      Seq("deg_x", "deg_y"))
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Shared helpers of the gate-registry shards (Gates1..Gates6) —
  * relocated verbatim from [[SparkEntry]] (r15 verdict #6). */
private[graft] object GateSupport {
  def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"
  def cents(c: Column): Column = floor(c * 100).cast(LongType)
  val CENTS = "CAST(FLOOR(%s * 100) AS BIGINT)"

  /** The shared k-means replay chain (q232/q233/q235): 3 Lloyd rounds
    * with 1/1024-grid centroids on the shifted-positive q-grid — every
    * step Int64-exact, mirroring [[graft.embed.Clustering.kmeans]]
    * (seeds by md5 order; argmin ties on cluster id; empty clusters
    * keep their centroid; `//` == Spark's `div` because the domain is
    * positive). `pred` restricts the TRAINING set. Ends with `a3` =
    * (vec_id, cluster, d2) and `c2` = the final centroid model. */
  def kmeansCtes(pred: String): String =
    s"""pts AS MATERIALIZED (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |         CAST(FLOOR((CAST(UNNEST(embedding) AS DOUBLE) + 2.0) * 1000)
      |           AS BIGINT) AS x
      |  FROM embeddings WHERE $pred),
      |seeds AS MATERIALIZED (
      |  SELECT vec_id AS cluster FROM embeddings WHERE $pred
      |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
      |c0 AS MATERIALIZED (
      |  SELECT s.cluster, p.dim, p.x * 1024 AS r
      |  FROM seeds s JOIN pts p ON p.vec_id = s.cluster),
      |a1p AS MATERIALIZED (
      |  SELECT p.vec_id, c.cluster,
      |         CAST(SUM((p.x*1024 - c.r)*(p.x*1024 - c.r)) AS BIGINT) AS d2
      |  FROM pts p JOIN c0 c ON p.dim = c.dim GROUP BY p.vec_id, c.cluster),
      |a1 AS MATERIALIZED (
      |  SELECT vec_id, cluster, d2 FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY d2, cluster) AS rn FROM a1p) WHERE rn = 1),
      |u1 AS MATERIALIZED (
      |  SELECT a.cluster, p.dim,
      |         CAST((SUM(p.x) * 1024) // COUNT(*) AS BIGINT) AS r
      |  FROM a1 a JOIN pts p ON a.vec_id = p.vec_id GROUP BY a.cluster, p.dim),
      |c1 AS MATERIALIZED (
      |  SELECT * FROM u1 UNION ALL
      |  SELECT * FROM c0 WHERE cluster NOT IN (SELECT DISTINCT cluster FROM u1)),
      |a2p AS MATERIALIZED (
      |  SELECT p.vec_id, c.cluster,
      |         CAST(SUM((p.x*1024 - c.r)*(p.x*1024 - c.r)) AS BIGINT) AS d2
      |  FROM pts p JOIN c1 c ON p.dim = c.dim GROUP BY p.vec_id, c.cluster),
      |a2 AS MATERIALIZED (
      |  SELECT vec_id, cluster, d2 FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY d2, cluster) AS rn FROM a2p) WHERE rn = 1),
      |u2 AS MATERIALIZED (
      |  SELECT a.cluster, p.dim,
      |         CAST((SUM(p.x) * 1024) // COUNT(*) AS BIGINT) AS r
      |  FROM a2 a JOIN pts p ON a.vec_id = p.vec_id GROUP BY a.cluster, p.dim),
      |c2 AS MATERIALIZED (
      |  SELECT * FROM u2 UNION ALL
      |  SELECT * FROM c1 WHERE cluster NOT IN (SELECT DISTINCT cluster FROM u2)),
      |a3p AS MATERIALIZED (
      |  SELECT p.vec_id, c.cluster,
      |         CAST(SUM((p.x*1024 - c.r)*(p.x*1024 - c.r)) AS BIGINT) AS d2
      |  FROM pts p JOIN c2 c ON p.dim = c.dim GROUP BY p.vec_id, c.cluster),
      |a3 AS MATERIALIZED (
      |  SELECT vec_id, cluster, d2 FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      |      ORDER BY d2, cluster) AS rn FROM a3p) WHERE rn = 1)""".stripMargin

  /** Sliding aggregate of order totalprice cents over orderkey rank.
    * numParts = 0 → auto-derived from parallelism; the result is
    * partition-count independent (property-tested), so the oracle holds
    * at any scale-out. */
  def slidingOrders(s: SparkSession, dir: String, w: Int, mon: LongMonoid): DataFrame = {
    val orders = s.read.parquet(t(dir, "orders"))
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("v"))
    SlidingAggregate.scalable(orders, "o_orderkey", "v", w, numParts = 0, mon)
      .orderBy("rank")
  }

  def slidingOrdersSql(w: Int, fn: String): String = {
    val v = CENTS.format("o_totalprice")
    val agg = fn match {
      case "count" => "COUNT(*)"
      case f       => s"$f($v)"
    }
    s"""SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey)) - 1 AS rank,
       |       CAST(o_orderkey AS BIGINT) AS key,
       |       CAST($agg OVER (ORDER BY o_orderkey
       |                       ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS agg
       |FROM orders ORDER BY rank""".stripMargin
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-equivalent `oracleSql` where SQL-expressible.
  *
  * Determinism notes (both engines must hash-match cell-for-cell):
  *  - doubles are quantized to integer cents (`floor(x*100)` as BIGINT)
  *    before aggregation — IEEE multiply+floor is identical in Spark and
  *    DuckDB, and 64-bit integer sums are exact and order-independent,
  *    unlike floating-point sums which depend on combine order;
  *  - every output is sorted on a unique key in BOTH engines;
  *  - every computed column is aliased identically in both.
  */
object SparkEntry {
  import GateSupport._

  /** Flagship query on sf=0.001: the reference's headline operator — a
    * distributed sliding-window SUM over globally sorted orders. */
  def entry(spark: SparkSession): DataFrame = {
    val orders = spark.read.parquet(t("/root/testdata/sf0.001", "orders"))
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("v"))
    SlidingAggregate.scalable(orders, "o_orderkey", "v", window = 50, numParts = 8)
  }

  /** One entry per implemented operator — assembled from the by-family
    * registry shards (Gates1..Gates6, split r15: the oracle SQL
    * lives beside its gate, files stay reviewable). Keys are unique by
    * the shards' construction (spec-gated). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = (
    Gates1.queries ++
    Gates2.queries ++
    Gates3.queries ++
    Gates4.queries ++
    Gates5.queries ++
    Gates6.queries
  ).toMap

  /** DuckDB-equivalent SQL per gate (same shards). */
  def oracleSql: Map[String, String] = (
    Gates1.oracles ++
    Gates2.oracles ++
    Gates3.oracles ++
    Gates4.oracles ++
    Gates5.oracles ++
    Gates6.oracles
  ).toMap
}

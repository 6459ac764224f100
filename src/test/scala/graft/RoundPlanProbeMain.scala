package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Prints the physical plan of ONE PageRank round's `next` frame in BOTH
  * loop shapes — the plan the final gate explain cannot show (each round
  * is consumed by an eager checkpoint):
  *
  *  - BEFORE / broadcast regime: checkpoints carry UnknownPartitioning
  *    (what `localCheckpoint` returns under AQE), so the round plan
  *    re-broadcasts the FULL edge table (BroadcastExchange of eDeg) and
  *    re-exchanges the rank table every round;
  *  - AFTER / pinned regime: explicit-N hash-partitioned pre-sorted
  *    checkpoints with `declare = true` (the barrier carries the
  *    executed plan's partitioning/ordering) + merge-hinted joins — the
  *    only Exchange left is the contrib aggregation's.
  *
  * Usage: scripts/jrun.sh graft.RoundPlanProbeMain [sfDir]
  */
object RoundPlanProbeMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Checkpoints

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("src"),
      (col("l_suppkey") * 2 + 1).cast(LongType).as("dst")).distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val e = Checkpoints.checkpoint(edges.withColumn("w", lit(1L)))
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val scale = 1000000L
    val base = 15L * scale / 100L

    def roundPlan(eDeg: org.apache.spark.sql.DataFrame,
                  ranks: org.apache.spark.sql.DataFrame,
                  mh: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val contribs = eDeg.join(mh(ranks), eDeg("src") === ranks("node"))
        .select(col("dst"), expr("(r * w) div outw").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("s"))
      ranks.select(col("node"), col("r").as("rp"))
        .join(mh(contribs), col("node") === contribs("dst"), "left")
        .select(col("node"), col("rp"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    }

    // BEFORE shape: AQE-coalesced repartition, undeclared checkpoints
    val eDeg0 = Checkpoints.checkpoint(
      e.join(outw, "src").repartition(col("src")))
    val nodes0 = Checkpoints.checkpoint(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val ranks0 = Checkpoints.checkpoint(nodes0.withColumn("r", lit(scale)))
    println("##### BEFORE (broadcast regime / undeclared checkpoints) — one round:")
    roundPlan(eDeg0, ranks0, identity).explain("formatted")

    // AFTER shape: pinned regime — explicit-N, pre-sorted, declared
    val parts = Checkpoints.sizedParts(spark,
      Checkpoints.materializedBytes(eDeg0).getOrElse(Long.MaxValue))
    val eDegP = Checkpoints.checkpoint(eDeg0
      .repartition(parts, col("src")).sortWithinPartitions("src"), declare = true)
    val ranksP = Checkpoints.checkpoint(ranks0
      .repartition(parts, col("node")).sortWithinPartitions("node"), declare = true)
    println(s"\n##### AFTER (pinned regime, parts=$parts, declared+sorted) — one round:")
    roundPlan(eDegP, ranksP, _.hint("merge")).explain("formatted")
    spark.stop()
  }
}

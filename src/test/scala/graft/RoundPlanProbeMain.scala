package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Prints the physical plan of ONE PageRank round's `next` frame — the
  * plan the final gate explain cannot show (each round is consumed by an
  * eager checkpoint) — for the q111 input shape, so the per-round
  * Exchange count is inspectable evidence, not an inference.
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
    val nodes = Checkpoints.checkpoint(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val eDeg = Checkpoints.checkpoint(e.join(outw, "src")
      .repartition(parts, col("src")).sortWithinPartitions("src"))

    val scale = 1000000L
    val base = 15L * scale / 100L
    val ranks = Checkpoints.checkpoint(
      nodes.withColumn("r", lit(scale)).repartition(parts, col("node")))
    def pinfo(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          s"part=${l.outputPartitioning} ord=${l.outputOrdering} " +
            s"stats=${df.queryExecution.optimizedPlan.stats.sizeInBytes}"
      }.getOrElse("?")
    println("##### ranks checkpoint: " + pinfo(ranks))
    println("##### eDeg checkpoint: " + pinfo(eDeg))

    val contribs = eDeg.join(ranks, eDeg("src") === ranks("node"))
      .select(col("dst"), expr("(r * w) div outw").as("contrib"))
      .groupBy("dst").agg(sum("contrib").as("s"))
    val next = ranks.select(col("node"), col("r").as("rp"))
      .join(contribs, col("node") === contribs("dst"), "left")
      .select(col("node"), col("rp"),
        (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
    println("\n##### one PageRank round (`next`) plan:")
    next.explain("formatted")
    // now EXECUTE it so the AQE-final plan shape is also visible
    next.write.format("noop").mode("overwrite").save()
    println("\n##### one PageRank round EXECUTED (AQE final):")
    println(next.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}

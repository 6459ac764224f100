package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries so scan pruning (`ReadSchema`), filter pushdown
  * (`PushedFilters`), join strategies (BroadcastHashJoin vs SortMerge),
  * and WholeStageCodegen spans can be inspected per round.
  *
  * Usage: runMain graft.Plans [sfDir] [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val which = if (args.length > 1) args.drop(1).toSet else Set(
      "q02_total_sort", "q11_groupby_agg", "q12_join_revenue", "q13_topk",
      "q21_event_window", "q22_topk_cosine", "q23_jaccard_pairs", "q35_pivot", "q37_asof",
      "q47_packing", "q50_skipgrams",
      "q52_range_join", "q54_embed_pairs", "q55_hash_sample", "q56_chargram_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => which(q._1)).foreach { case (name, fn) =>
      println(s"\n===================== $name =====================")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage-layout helpers for the two patterns that matter most at 100 TB:
  *
  *  - BUCKETING: persisting both join sides bucketed (and sorted) by the
  *    join key lets Spark plan a SortMergeJoin with NO shuffle exchange —
  *    the join cost collapses to a per-bucket merge. This is how repeated
  *    large-fact joins should be laid out instead of re-shuffling per query.
  *  - PARTITIONING: directory-partitioning by a low-cardinality filter
  *    column turns predicates into partition pruning — files outside the
  *    predicate are never opened.
  */
object Layout {

  /** Saves `df` as a bucketed, in-bucket-sorted managed table. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Saves `df` directory-partitioned by `partCol`. */
  def savePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** Joins two bucketed tables on their bucket key (shuffle-free when both
    * are bucketed the same way — asserted in the spec). */
  def joinBucketed(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Writes training shards: range-partitioned and sorted on `sortCol`,
    * each output file capped at `maxRecordsPerShard` rows. Shard key
    * ranges never interleave — consumption in shard order is consumption
    * in key order — though a RUN OF EQUAL keys may straddle adjacent
    * shards (the cap splits mid-run); resume on a key boundary strictly
    * above the last completed shard's max, or use a unique sort key.
    * The cap is what keeps a shard loadable by a fixed-memory data-loader
    * worker at any corpus scale; the range partitioning is one shuffle and
    * the per-file split is writer-side (no extra job). */
  def saveShards(df: DataFrame, path: String, sortCol: String,
                 maxRecordsPerShard: Long): Unit = {
    require(maxRecordsPerShard >= 1, "maxRecordsPerShard must be >= 1")
    df.repartitionByRange(df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .parquet(path)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dense global ranks 0..n-1 by `sortCols`, computed scalably (no
  * single-partition window).
  *
  * This one expression replaces reference ops #3–#9 — Bernoulli sample →
  * splitter quantiles → range shuffle → per-partition sort → per-partition
  * count sentinels → rank offsets (`/root/reference/src/SlidingAggregation
  * .java:38-210`): `repartitionByRange` samples splitters internally
  * (TeraSort-style `RangePartitioner`), and `zipWithIndex` runs the count
  * pass and computes partition offsets exactly like the reference's
  * `PairInt(-1, count)` sentinel broadcast, minus the in-band sentinels.
  *
  * Scale note: the semantic twin `row_number().over(Window.orderBy(...))`
  * collapses to one task; this form stays fully parallel — the only wide
  * exchange is the range shuffle, and the count pass reuses its shuffle
  * files (skipped stage), so data moves once.
  */
object GlobalRank {
  /** numParts <= 0 derives the partition count from default parallelism;
    * ranks are identical for any partitioning (property-tested). */
  def withRank(df: DataFrame, numParts: Int, rankCol: String, sortCols: Column*): DataFrame = {
    val parts = if (numParts >= 1) numParts
      else math.max(2, df.sparkSession.sparkContext.defaultParallelism)
    // cache BEFORE the range shuffle (knob: RangeInputCache — off at
    // storage-bound scale): repartitionByRange scans its child once for the
    // RangePartitioner bounds sample and again for the shuffle map;
    // zipWithIndex's eager count job materializes the shuffle, after which
    // the cache is released
    val (src, release) = RangeInputCache.acquire(df)
    val sorted = src.repartitionByRange(parts, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    val zipped = sorted.rdd.zipWithIndex() // runs the count pass eagerly
    release() // consumers re-read the shuffle files, not the source
    val rdd = zipped.map { case (row, i) => Row.fromSeq(row.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}

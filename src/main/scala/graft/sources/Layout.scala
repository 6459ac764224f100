package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  /** Morton (Z-order) interleave of two non-negative `bits`-bit integers:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Nearby (x, y)
    * points get nearby z values, so range-partitioning by z clusters BOTH
    * dimensions at once — the multi-column data-skipping layout
    * (Delta/Iceberg OPTIMIZE ZORDER) that single-column range layout
    * can't give: after [[saveZOrdered]], parquet min/max footers prune
    * files for predicates on x, on y, or on both. Pure shift/mask
    * arithmetic (whole-stage codegen'd, no UDF); out-of-range input
    * raises rather than silently corrupting the clustering. */
  def zorderValue(x: Column, y: Column, bits: Int): Column =
    zorderValueN(Seq(x, y), bits)

  /** N-dimensional Morton interleave: bit i of dimension j lands at
    * position i·N + j (dimension 0 in the lowest lane — the 2-column
    * [[zorderValue]] is exactly N = 2). N·bits must fit a non-negative
    * Int64 (≤ 62). */
  def zorderValueN(cols: Seq[Column], bits: Int): Column = {
    val nDims = cols.length
    require(nDims >= 2, "zorder needs at least 2 columns")
    require(bits >= 1 && nDims * bits <= 62,
      s"need 1 <= bits and ${nDims}*bits <= 62, got bits=$bits")
    val vs = cols.map(_.cast(LongType))
    val lim = 1L << bits
    val z = (for (i <- 0 until bits; j <- 0 until nDims) yield
      shiftleft(shiftright(vs(j), i).bitwiseAND(lit(1L)), i * nDims + j))
      .reduce(_ + _)
    val inRange = vs.map(v => v >= 0 && v < lim).reduce(_ && _)
    when(inRange, z)
      .otherwise(raise_error(concat(
        lit(s"zorderValue: input outside [0, $lim) — raise bits: ("),
        concat_ws(", ", vs.map(_.cast("string")): _*), lit(")"))))
  }

  /** Z-order-clustered write: range-repartition on the Morton code of
    * (`xCol`, `yCol`) into `numFiles` files, sorted within each. File z
    * ranges never interleave, so each file covers a compact (x, y) tile
    * and min/max skipping works on both columns. One shuffle. */
  def saveZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                   bits: Int, numFiles: Int): Unit =
    saveZOrderedN(df, path, Seq(xCol, yCol), bits, numFiles)

  /** N-dimensional [[saveZOrdered]]: range-repartition on the N-column
    * Morton code of `cols` into `numFiles` files, sorted within each.
    * File z ranges never interleave, so each file covers a compact
    * N-dimensional tile and parquet min/max footers prune on ANY of the
    * N columns (the 2-column form is exactly `cols.length == 2`). One
    * shuffle; `N·bits <= 62` as in [[zorderValueN]]. */
  def saveZOrderedN(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val zCol = "__graft_zorder"
    require(!df.columns.contains(zCol), s"input must not contain $zCol")
    df.withColumn(zCol, zorderValueN(cols.map(col), bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}

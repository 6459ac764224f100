package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running totals — the scalable replacement for
  * `AGG(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)` with no
  * PARTITION BY, which Spark executes as ONE task holding the whole
  * dataset.
  *
  * Classic two-pass prefix scan over a range shuffle (the same
  * per-partition-offsets machinery as [[OrderStats]] and the reference's
  * count-sentinel protocol,
  * `/root/reference/src/SlidingAggregation.java:159-210`), generic over
  * any [[LongMonoid]] (sum, min, max, count — the prefix-MAX form is what
  * turns the skyline's all-pairs dominance anti-join into one scan):
  *   1. range-partition + sort by the order columns (TeraSort);
  *   2. per-partition fold → driver `scanLeft` → broadcast (O(parts));
  *   3. narrow map emitting each row's exclusive running aggregate.
  * The totals pass and the output pass are jobs over the SAME shuffled RDD,
  * so the range shuffle's map output is reused (data moves once).
  */
object PrefixSum {

  /** Appends `outCol` = exclusive running SUM of `valueCol` in
    * `orderCols` order (the monoid-generic [[scan]] with
    * [[LongMonoid.Sum]] — kept as the named common case). */
  def exclusive(df: DataFrame, valueCol: String, outCol: String, numParts: Int,
                orderCols: Column*): DataFrame =
    scan(df, valueCol, outCol, numParts, LongMonoid.Sum, orderCols: _*)

  /** Appends `outCol` = exclusive running `monoid`-aggregate of
    * `valueCol` (a BIGINT column) in `orderCols` order: the fold of all
    * STRICTLY PRECEDING rows' values (monoid zero for the first row).
    * `numParts <= 0` derives the partition count from default
    * parallelism; the result is partition-count independent. */
  def scan(df: DataFrame, valueCol: String, outCol: String, numParts: Int,
           monoid: LongMonoid, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // numParts <= 0: derive the range-partition count from the INPUT
    // SIZE estimate at the AQE advisory partition size (r15 optimization
    // round, guide §2.2) — the old default (defaultParallelism) was a
    // core-count constant: 32 near-empty sort tasks for a 3 MB
    // distinct-value table at bench scale, yet a fixed 32 would
    // under-partition a 100 TB scan. Bounded to [2, 2^17].
    val parts = if (numParts >= 1) numParts
      else {
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        // an RDD-backed input (e.g. a GlobalRank output) carries the
        // stats-less DEFAULT estimate (Long.MaxValue) — that is "no
        // signal", not "huge": sizing from it made q186 a 131072-
        // partition range shuffle (2.4 s → 13.6 s). Fall back to the
        // old parallelism default there.
        if (est >= BigInt(Long.MaxValue) / 2)
          math.max(2, spark.sparkContext.defaultParallelism)
        else {
          val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
          (est / BigInt(math.max(1L, advisory)) + 1)
            .min(BigInt(1 << 17)).max(BigInt(2)).toInt
        }
      }
    // cache BEFORE the range shuffle (knob: RangeInputCache — off at
    // storage-bound scale): repartitionByRange scans its child once for the
    // RangePartitioner's bounds sample and again for the shuffle map
    val (src, release) = RangeInputCache.acquire(df)
    val sorted = src.repartitionByRange(parts, orderCols: _*).sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType, s"$valueCol must be BIGINT")
    // single RDD object: the totals job writes the shuffle files the output
    // job then re-reads (skipped map stage) — data moves once
    val rdd = sorted.rdd
    val totals = rdd.mapPartitions({ it =>
      var s = monoid.zero
      it.foreach { r =>
        if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
          s"prefix scan over NULL in '$valueCol' — a null would otherwise " +
            "NPE four task retries deep; filter or coalesce upstream")
        s = monoid.combine(s, r.getLong(vIdx))
      }
      Iterator.single(s)
    }, preservesPartitioning = true).collect()
    release() // the shuffle files hold the sorted data now
    val offsets = totals.scanLeft(monoid.zero)(monoid.combine)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+ StructField(outCol, LongType, nullable = false))
    val result = rdd.mapPartitionsWithIndex { (pi, it) =>
      var running = bOffsets.value(pi)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ running)
        running = monoid.combine(running, r.getLong(vIdx))
        out
      }
    }
    spark.createDataFrame(result, outSchema)
  }
}

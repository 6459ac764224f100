package graft.operators

import org.apache.spark.RangePartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Order-statistic operators over ONE range shuffle.
  *
  * Both entry points fix round-1's q08/q10 scale bug: the old form ran
  * `ranked.count()` (a full sort+rank job) and then re-derived the same
  * DataFrame lineage for the actual answer — two global shuffles of the
  * whole dataset at 100 TB. Here the range shuffle happens once at the RDD
  * layer; the count pass and the answer pass are jobs over the SAME RDD
  * object, so Spark skips the map stage and re-reads the shuffle files
  * (only the spillable reduce-side sort re-runs). No join, no zipWithIndex.
  *
  * Reference provenance: exact splitters replace the reference's sampled
  * splitter job (`/root/reference/src/SlidingAggregation.java:38-84`,
  * `chooseBorders :75-83`); block stats mirror its perfect-repartition math
  * `m = ceil(n/R)`, block = rank/m (`:224,233-236`).
  */
object OrderStats {

  private[graft] def sortedWithOffsets(kv0: RDD[(Long, Long)], numParts: Int)
    : (RDD[(Long, Long)], Array[Long]) = {
    // cache (knob: RangeInputCache — off at storage-bound scale): the
    // RangePartitioner's sampling job and the shuffle map stage both scan
    // the input (a parquet re-read each, otherwise); dropped as soon as
    // the count pass has written the shuffle files
    val (kv, release) = RangeInputCache.acquireRdd(kv0,
      org.apache.spark.sql.SparkSession.active)
    val part = new RangePartitioner(numParts, kv, ascending = true)
    val sorted = kv.repartitionAndSortWithinPartitions(part)
    val counts = sorted.mapPartitions(it => Iterator(it.size.toLong),
      preservesPartitioning = true).collect()
    release()
    (sorted, counts.scanLeft(0L)(_ + _))
  }

  /** The elements at the given global ranks of a partition-sorted RDD —
    * the order-statistic extraction shared by [[exactSplitters]] and the
    * sampled splitter path of `SlidingAggregate.scalable` (the reference's
    * `chooseBorders`): each partition walks its slice once, emitting one
    * (id, key) per target; COLLIDING target ranks (k > n) each get a row
    * at the shared key, so no splitter is silently dropped. Targets must
    * be rank-ascending; the result arrives id-ascending. O(#targets)
    * driver data — the bounded-collect sentinel protocol. */
  private[graft] def keysAtRanks(sorted: RDD[Long], offsets: Array[Long],
                                 targets: Array[(Long, Long)]): Array[(Long, Long)] = {
    val sc = sorted.sparkContext
    val bTargets = sc.broadcast(targets)
    val bOffsets = sc.broadcast(offsets)
    sorted.mapPartitionsWithIndex { (pi, it) =>
      val off = bOffsets.value(pi)
      val end = bOffsets.value(pi + 1)
      val mine = bTargets.value.filter(t => t._1 >= off && t._1 < end)
      if (mine.isEmpty) Iterator.empty
      else {
        var idx = off
        val out = Array.newBuilder[(Long, Long)]
        var ti = 0
        while (ti < mine.length && it.hasNext) {
          val key = it.next()
          while (ti < mine.length && idx == mine(ti)._1) {
            out += ((mine(ti)._2, key)); ti += 1
          }
          idx += 1
        }
        out.result().iterator
      }
    }.collect().sortBy(_._1)
  }

  /** Exact order statistics: splitter i (1..k-1) = the element at global
    * rank `i*n/k` of `keyCol` ascending. Output: (splitter_id, splitter).
    * numParts <= 0 derives parallelism; the answer is partition-independent. */
  def exactSplitters(df: DataFrame, keyCol: String, k: Int, numParts: Int): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numParts >= 1) numParts
      else math.max(2, spark.sparkContext.defaultParallelism)
    val kv = df.select(col(keyCol).cast(LongType)).rdd.map(r => (r.getLong(0), 0L))
    val (sorted, offsets) = sortedWithOffsets(kv, parts)
    val n = offsets.last
    // target ranks, ascending; each falls in exactly one partition
    val targets = (1 until k).map(i => (i.toLong * n / k, i.toLong)).toArray
    val rows = keysAtRanks(sorted.map(_._1), offsets, targets)
      .map { case (id, key) => Row(id, key) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), StructType(Seq(
      StructField("splitter_id", LongType, nullable = false),
      StructField("splitter", LongType, nullable = false))))
      .orderBy("splitter_id")
  }

  /** Sample-based splitters — the reference's own strategy
    * (`my.threshold` Bernoulli sample → order statistics of the sample,
    * `SlidingAggregation.java:38-84`) and the right call at 100 TB when
    * exactness isn't required: cost is one pass over a p-fraction sample
    * instead of a full range shuffle. Approximation error is the sampling
    * error of the p·n-point empirical quantile. Output like
    * [[exactSplitters]]: (splitter_id, splitter). */
  def sampledSplitters(df: DataFrame, keyCol: String, k: Int,
                       threshold: Double, seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast(LongType)).sample(threshold, seed)
      .rdd.map(_.getLong(0)).sortBy(identity).zipWithIndex().map(_.swap)
    val n = keys.count()
    // rank -> ALL splitter ids targeting it (k > n makes targets collide;
    // every id must still get a row, at the shared key)
    val byRank: Map[Long, Seq[Long]] =
      (1 until k).map(i => (i.toLong * n / k, i.toLong))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = keys.filter { case (idx, _) => byRank.contains(idx) }
      .collect()
      .flatMap { case (idx, key) => byRank(idx).map(id => Row(id, key)) }
      .sortBy(_.getLong(0))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), StructType(Seq(
      StructField("splitter_id", LongType, nullable = false),
      StructField("splitter", LongType, nullable = false))))
  }

  /** Per-rank-block (cnt, sum) with m = ceil(n/numBlocks), block = rank/m —
    * the reference's balanced repartition, summarized without materializing
    * ranks. Output: (block, cnt, sum_c). */
  def blockStats(df: DataFrame, keyCol: String, valueCol: String, numBlocks: Int): DataFrame = {
    val spark = df.sparkSession
    val kv = df.select(col(keyCol).cast(LongType), col(valueCol).cast(LongType))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    val (sorted, offsets) = sortedWithOffsets(kv, numBlocks)
    val n = offsets.last
    val m = (n + numBlocks - 1) / numBlocks
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val partials = sorted.mapPartitionsWithIndex { (pi, it) =>
      val off = bOffsets.value(pi)
      var idx = 0L
      val acc = scala.collection.mutable.LongMap.empty[(Long, Long)]
      it.foreach { case (_, v) =>
        val block = (off + idx) / m; idx += 1
        val (c, s) = acc.getOrElse(block, (0L, 0L))
        acc(block) = (c + 1, s + v)
      }
      acc.iterator
    }.reduceByKey((a: (Long, Long), b: (Long, Long)) => (a._1 + b._1, a._2 + b._2))
      .map { case (b, (c, s)) => Row(b, c, s) }
    spark.createDataFrame(partials, StructType(Seq(
      StructField("block", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("sum_c", LongType, nullable = false))))
      .orderBy("block")
  }
}

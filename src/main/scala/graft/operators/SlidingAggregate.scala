package graft.operators

import org.apache.spark.{Partitioner, RangePartitioner}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Routes composite exchange keys (target, tag, rank) by target, so
  * `repartitionAndSortWithinPartitions` delivers each block's messages
  * sorted (aggregates first, then data rows in rank order) from Spark's
  * spillable shuffle sort. */
private[graft] final class TargetKeyPartitioner(n: Int) extends Partitioner {
  def numPartitions: Int = n
  def getPartition(key: Any): Int = key.asInstanceOf[(Int, Int, Long)]._1
}

/** Range partitioner over explicit sorted borders — the reference's
  * `find_border` routing (`SlidingAggregation.java:128-134`) with a binary
  * search instead of its linear scan. Key k goes to the first partition
  * whose border exceeds it. */
private[graft] final class BorderPartitioner(borders: Array[Long], n: Int) extends Partitioner {
  def numPartitions: Int = n
  def getPartition(key: Any): Int = {
    val k = key.asInstanceOf[Long]
    var lo = 0; var hi = borders.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (borders(mid) <= k) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Sliding-window aggregation over a globally sorted dataset — the
  * reference's headline (and only) algorithm.
  *
  * Semantics (`/root/reference/src/SlidingAggregation.java`, SURVEY.md §0):
  * sort by key ascending, assign dense global ranks 0..n-1, and for each
  * rank r emit `(rank, key, AGG(value over ranks max(0, r-l+1) .. r))` —
  * partial leading windows, no padding.
  *
  * Two implementations:
  *
  *  - [[sql]] — `Window.orderBy(key).rowsBetween(-(l-1), 0)`. Semantically
  *    exact (incl. partial leading windows) and what Catalyst would pick,
  *    but a global ORDER BY window with no PARTITION BY collapses to a
  *    single task. Used as the in-Spark oracle and for DuckDB parity.
  *
  *  - [[scalable]] — the MRC-faithful distributed form, mirroring the
  *    reference's bounded-replication math (`remotelyRelevantReducers`,
  *    `SlidingAggregation.java:257-278`) with Spark primitives:
  *    range-partition + sort (TeraSort), rank via a count pass that reuses
  *    the shuffle, then ONE bounded exchange where each row is replicated to
  *    at most 3 partitions and each partition's full aggregate travels to at
  *    most d+1 successors (the reference broadcasts them to ALL partitions —
  *    O(R²) sentinels; we send O(R·d)). Communication O(n·(1+l/m) + R·d),
  *    same bound as the reference with strictly fewer barriers (5 MR jobs +
  *    5 HDFS materializations → 1 range shuffle + 1 bounded exchange).
  */
object SlidingAggregate {

  /** Window-function form: exact but single-task. `avg` is integer
    * (truncating) division of the windowed sum by the window count, matching
    * [[withAvg]] on the scalable path. */
  def sql(df: DataFrame, keyCol: String, valueCol: String, window: Int,
          agg: String = "sum"): DataFrame = {
    val order = Window.orderBy(col(keyCol))
    val frame = order.rowsBetween(-(window - 1).toLong, Window.currentRow)
    if (agg == "avg")
      df.select(
        (row_number().over(order) - 1).cast(LongType).as("rank"),
        col(keyCol).cast(LongType).as("key"),
        sum(col(valueCol)).over(frame).cast(LongType).as("s"),
        count(col(valueCol)).over(frame).as("c"))
        .select(col("rank"), col("key"), expr("CAST(s div c AS BIGINT)").as("agg"))
    else {
      val windowed = agg match {
        case "sum"   => sum(col(valueCol)).over(frame)
        case "count" => count(col(valueCol)).over(frame)
        case "min"   => min(col(valueCol)).over(frame)
        case "max"   => max(col(valueCol)).over(frame)
        case other   => throw new IllegalArgumentException(s"unknown aggregate: $other")
      }
      df.select(
        (row_number().over(order) - 1).cast(LongType).as("rank"),
        col(keyCol).cast(LongType).as("key"),
        windowed.cast(LongType).as("agg"))
    }
  }

  /** avg on the scalable path: run [[scalable]] with SUM, then divide by the
    * window count — which needs NO second pass because ranks are dense:
    * count at rank r is exactly min(l, r+1) (partial leading windows). */
  def withAvg(sumResult: DataFrame, window: Int): DataFrame =
    sumResult.withColumn("agg",
      expr(s"CAST(agg div least(CAST($window AS BIGINT), rank + 1) AS BIGINT)"))

  private val outSchema = StructType(Seq(
    StructField("rank", LongType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("agg", LongType, nullable = false)))

  /** Distributed form. Input: any DF with a Long-castable key and value
    * column. `numParts` is the reference's `my.reducers`; pass `numParts
    * <= 0` to derive it from the cluster's default parallelism. Returns
    * (rank, key, agg), partitioned into balanced rank blocks.
    *
    * Memory bound (the 100 TB design point): the evaluator is STREAMING —
    * messages arrive pre-sorted from Spark's spillable shuffle sort
    * (composite key (target, tag, rank)), so a task never materializes its
    * block. Residual state per task is primitive Long arrays:
    * O(min(2m, m+l)) for the replicated predecessor run + O(min(l, m)) for
    * the own-block prefix ring / monotonic deque + O(d) block aggregates —
    * ~24·m bytes worst case, NOT the O(m) boxed rows + in-heap sort the
    * reference's reducers need (`SlidingAggregation.java:391-394`). Size
    * numParts so m = n/numParts keeps 24m within the task heap budget.
    */
  def scalable(df: DataFrame, keyCol: String, valueCol: String, window: Int,
               numParts: Int, monoid: LongMonoid = LongMonoid.Sum,
               sampleThreshold: Option[Double] = None): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    val parts =
      if (numParts >= 1) numParts
      else math.max(2, spark.sparkContext.defaultParallelism)
    val l = window

    // Cached (knob: RangeInputCache — off at storage-bound scale): the
    // splitter-sampling job and the range-shuffle map stage both scan the
    // input — without the cache each re-reads the parquet source.
    // Released as soon as the shuffle files hold the data (below).
    val kv0: RDD[(Long, Long)] = df
      .select(col(keyCol).cast(LongType), col(valueCol).cast(LongType))
      .rdd.map { r =>
        // fail actionably: a NULL here would otherwise NPE four task
        // retries deep (the sql() oracle path tolerates NULLs — silently
        // diverging results would be worse than an error)
        if (r.isNullAt(0) || r.isNullAt(1)) throw new IllegalArgumentException(
          s"NULL in '$keyCol'/'$valueCol' — filter or coalesce upstream")
        (r.getLong(0), r.getLong(1))
      }
    val (kv, releaseInput) = RangeInputCache.acquireRdd(kv0, spark)

    // TeraSort: sampled range partitioner + shuffle-time per-partition sort
    // (reference jobs J1+J2, SlidingAggregation.java:38-170). By default the
    // RangePartitioner's reservoir sample picks the splitters; the explicit
    // `sampleThreshold` path reproduces the reference's `my.threshold`
    // Bernoulli-sample splitter job (`:38-84`) — `chooseBorders`'s
    // equidistant order statistics of the sample (`:75-83`), minus two
    // quirks: its crash when the sample is smaller than the partition
    // count, and its funnel of the WHOLE sample into one JVM (one reducer
    // there, `numReduceTasks(1)` :444 — the round-2 form collected it to
    // the driver: threshold 0.5 ⇒ half the dataset in driver heap). Here
    // the sample is sorted DISTRIBUTED and only the parts-1 order
    // statistics come back — O(parts) driver heap, same borders
    // (keys[(i·s)/R], :75-83) bit-for-bit, so goldens are unchanged.
    val part: Partitioner = sampleThreshold match {
      case Some(t) =>
        val s = kv.map(_._1).sample(withReplacement = false, t, seed = 42L).sortBy(identity)
        val sCounts = s.mapPartitions(it => Iterator(it.size.toLong),
          preservesPartitioning = true).collect()
        val sOffs = sCounts.scanLeft(0L)(_ + _)
        val sn = sOffs.last
        if (sn < parts) new RangePartitioner(parts, kv, ascending = true)
        else {
          // target sample ranks i·sn/parts are strictly increasing for
          // sn >= parts; extraction shared with OrderStats (chooseBorders'
          // keys[(i·s)/R] order statistics, bit-for-bit — golden-gated)
          val targets = (1 until parts)
            .map(i => ((i.toLong * sn) / parts, i.toLong)).toArray
          val borders = OrderStats.keysAtRanks(s, sOffs, targets).map(_._2)
          new BorderPartitioner(borders, parts)
        }
      case None => new RangePartitioner(parts, kv, ascending = true)
    }
    val sorted = kv.repartitionAndSortWithinPartitions(part)

    // Count pass — replaces the reference's in-band PairInt(-1, count)
    // sentinels + driver counter (J3, :159-210,491-497). Runs the range
    // shuffle's map stage; every later job reuses its output. This pass
    // also subsumes the former up-front isEmpty() job (n == 0 below).
    val counts = sorted.mapPartitions(it => Iterator(it.size.toLong), preservesPartitioning = true)
      .collect()
    releaseInput() // shuffle files now hold the data
    val offsets = counts.scanLeft(0L)(_ + _)
    val n = offsets.last
    if (n == 0) return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    val m = (n + parts - 1) / parts                // block size, reference :224
    val r = ((n + m - 1) / m).toInt                // actual number of rank blocks
    val d = ((l - 1) / m).toInt                    // window span in blocks, :261
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val mon = monoid

    // ONE bounded exchange carrying both data rows and block aggregates
    // (reference J4+J5, :213-310). Key: (target, tag, rank|srcBlock) with
    // tag 0 = aggregate, 1 = data — so the shuffle sort delivers each
    // block's aggregates first, then data rows in ascending rank order.
    //
    // A row at rank ρ in block p = ρ/m is needed raw by: p itself; block
    // p+d (whose windows always start inside p or p-1); and block p+d+1 iff
    // ρ + l - 1 >= (p+d+1)·m (only p's tail — the reference ships whole
    // partitions there, :282-299; the filter is a strict improvement).
    // Blocks between the window start and the current block are always
    // FULLY covered by the window, so they contribute via their total
    // aggregate only — shipped to the ≤ d+1 successor blocks that can need
    // it (the reference broadcasts to all R blocks, :306-310).
    val exchanged = sorted.mapPartitionsWithIndex { (pi, it) =>
      val off = bOffsets.value(pi)
      var idx = 0L
      val partials = mutable.LongMap.empty[Long] // block -> partial aggregate
      val dataMsgs = it.flatMap { case (k, v) =>
        val rank = off + idx; idx += 1
        val p = (rank / m).toInt
        val lifted = mon.lift(v)
        partials(p) = mon.combine(partials.getOrElse(p, mon.zero), lifted)
        val b = List.newBuilder[((Int, Int, Long), (Long, Long))]
        b += (((p, 1, rank), (k, lifted)))
        val t1 = p + d
        if (d > 0 && t1 < r) b += (((t1, 1, rank), (k, lifted)))
        val t2 = p + d + 1
        if (t2 < r && rank + l - 1 >= t2 * m) b += (((t2, 1, rank), (k, lifted)))
        b.result()
      }
      // targets p+d and p+d+1 receive block p as RAW rows and the
      // evaluator skips their aggregates unconditionally (q != p-d-1,
      // q != p-d below) — proof: a target P reads aggregates only for
      // q in [P-d+1, P-1] (w0 >= P·m - l + 1 and l <= (d+1)·m bound
      // q0 >= P-d-1, and the two raw-delivered blocks are excluded), so
      // block p's aggregate is consumed by P in [p+1, p+d-1] exactly.
      // Shipping past p+d-1 was pure dead traffic — for d <= 1 (window
      // within a block, the common regime) ALL aggregate messages are.
      def aggMsgs = partials.iterator.flatMap { case (p, s) =>
        val pInt = p.toInt
        (pInt + 1 to math.min(pInt + d - 1, r - 1)).iterator
          .map(q => ((q, 0, p), (0L, s)))
      }
      dataMsgs ++ aggMsgs
    }.repartitionAndSortWithinPartitions(new TargetKeyPartitioner(r))

    // Per-block STREAMING evaluation (reference AggrReducer, :344-430,
    // minus its buffer-everything reducer). Messages arrive sorted:
    //   1. aggregates of fully-covered predecessor blocks → tiny map;
    //   2. replicated predecessor rows (ranks < p·m) — a contiguous dense
    //      run [r0, p·m): fold into a prefix array (invertible monoids) or
    //      value array converted in-place to suffix aggregates (idempotent)
    //      — suffix suffices because any window reaching the early run
    //      covers it through to its end;
    //   3. own rows (ranks >= p·m), streamed one-by-one: the own-block part
    //      of window [w0, ρ] comes from a prefix-value ring buffer
    //      (invertible) or a monotonic deque (idempotent) — both O(min(l,m)).
    val resultRdd = exchanged.mapPartitionsWithIndex { (p, msgIt) =>
      val it = msgIt.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val lowestOwned = p.toLong * m

        // phase 1: block aggregates (tag 0)
        val blockAgg = mutable.LongMap.empty[Long]
        while (it.hasNext && it.head._1._2 == 0) {
          val ((_, _, srcBlock), (_, partial)) = it.next()
          blockAgg(srcBlock) = mon.combine(blockAgg.getOrElse(srcBlock, mon.zero), partial)
        }

        // phase 2: replicated early run (ranks < p·m), dense + contiguous
        var earlyStart = -1L
        var earlyLen = 0
        var early = new Array[Long](16) // prefix values (invertible) or raw values
        val invertible = mon.invert.isDefined
        if (invertible) early(0) = mon.zero
        while (it.hasNext && it.head._1._3 < lowestOwned) {
          val ((_, _, rank), (_, v)) = it.next()
          if (earlyStart < 0) earlyStart = rank
          val need = if (invertible) earlyLen + 2 else earlyLen + 1
          if (need > early.length) early = java.util.Arrays.copyOf(early, early.length * 2)
          if (invertible) early(earlyLen + 1) = mon.combine(early(earlyLen), v)
          else early(earlyLen) = v
          earlyLen += 1
        }
        if (!invertible) {
          require(mon.idempotent, s"monoid ${mon.name} supports neither inversion nor idempotent RMQ")
          // in-place suffix aggregates: early(j) = agg of raw values j..end
          var j = earlyLen - 2
          while (j >= 0) { early(j) = mon.combine(early(j), early(j + 1)); j -= 1 }
        }
        val earlyArr = early
        val e0 = earlyStart

        // early-run contribution of a window starting at w0 (< p·m): the
        // window always covers the run from w0 through its end
        def earlyFrom(w0: Long): Long = {
          if (earlyLen == 0) mon.zero
          else {
            val idx = math.max(w0 - e0, 0L).toInt
            if (idx >= earlyLen) mon.zero
            else if (invertible) mon.invert.get(earlyArr(earlyLen), earlyArr(idx))
            else earlyArr(idx)
          }
        }

        // phase 3: stream own rows
        val ringSize = (math.min(l.toLong, m) + 1).toInt
        val ring = new Array[Long](ringSize) // own prefix values (invertible)
        ring(0) = mon.zero
        val deque = new java.util.ArrayDeque[Array[Long]]() // (rank, value), idempotent
        var ownCount = 0L
        it.map { case ((_, _, rank), (key, v)) =>
          val i = ownCount; ownCount += 1
          val w0 = math.max(0L, rank - l + 1)
          var acc =
            if (invertible) {
              val cur = ((i + 1) % ringSize).toInt
              ring(cur) = mon.combine(ring((i % ringSize).toInt), v)
              val s = math.max(w0 - lowestOwned, 0L) // own-run start index
              mon.invert.get(ring(cur), ring((s % ringSize).toInt))
            } else {
              while (!deque.isEmpty && mon.combine(deque.peekLast()(1), v) == v) deque.pollLast()
              deque.addLast(Array(rank, v))
              while (deque.peekFirst()(0) < w0) deque.pollFirst()
              deque.peekFirst()(1)
            }
          if (w0 < lowestOwned) {
            acc = mon.combine(acc, earlyFrom(w0))
            val q0 = (w0 / m).toInt
            var q = q0
            while (q < p) {
              // blocks p-d-1 and p-d arrived as raw early rows
              if (q != p - d - 1 && q != p - d) acc = mon.combine(acc, blockAgg.getOrElse(q.toLong,
                throw new IllegalStateException(s"missing aggregate for block $q at block $p")))
              q += 1
            }
          }
          Row(rank, key, acc)
        }
      }
    }
    spark.createDataFrame(resultRdd, outSchema)
  }
}

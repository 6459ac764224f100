package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 2-D Pareto frontier (skyline): the rows no other row STRICTLY
  * dominates — x' > x AND y' > y — the multi-criteria "best trade-offs"
  * filter (quality-vs-length corpus curation, cost-vs-accuracy model
  * sweeps, spend-vs-frequency account tiers).
  *
  * The staircase observation replaces the naive all-pairs dominance
  * anti-join (O(n²), the only pure-SQL form) with ONE monotone scan: a
  * point is dominated iff max{ y' : x' > x } > y. So: frequency-compress
  * to (x, max y) — exchange O(distinct x) — then an exclusive prefix-MAX
  * over distinct x DESCENDING ([[PrefixSum.scan]] with
  * [[LongMonoid.Max]], the TeraSort two-pass machinery — O(parts) driver
  * state, never a partitionless window), and join the O(distinct x)
  * threshold table back co-partitioned to keep every surviving point.
  * Ties survive in both axes (equal is not strict dominance).
  */
object Skyline {

  /** Rows of `df` (NULL x/y rows dropped — dominance over NULL is
    * undefined) not strictly dominated on BIGINT columns (x, y). */
  def pareto2d(df: DataFrame, x: String, y: String): DataFrame = {
    require(x != y, s"skyline needs two distinct criteria, got '$x' twice")
    Seq(x, y).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"), s"column name '$c' collides with internal __* names")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
    }
    val pts = df.filter(col(x).isNotNull && col(y).isNotNull)
    val perX = pts.groupBy(col(x)).agg(max(col(y)).as("__ymax"))
    // __dom = max y over STRICTLY greater x (exclusive prefix, x desc);
    // the monoid zero (Long.MinValue) at the staircase top dominates
    // nothing, so `y >= __dom` keeps it unconditionally
    val thr = PrefixSum.scan(perX, "__ymax", "__dom", numParts = 0,
        LongMonoid.Max, col(x).desc)
      .select(col(x), col("__dom"))
    pts.join(thr, Seq(x))
      .filter(col(y) >= col("__dom"))
      .drop("__dom")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** 2-D (y, z) dominance frontier — the per-partition summary the 3-D
    * skyline carries across partitions. Invariant: keys (y) strictly
    * decrease ⇒ values (z) strictly increase, so "∃ inserted (y′, z′)
    * with y′ > y ∧ z′ > z" is ONE TreeMap probe: among entries with
    * y′ > y the max z′ sits at the SMALLEST such y′ (`higherEntry`).
    * Insert is amortized O(log n): weakly-dominated points are rejected
    * by one ceiling probe, and each map entry is removed at most once. */
  private[graft] final class Frontier extends Serializable {
    private val m = new java.util.TreeMap[Long, Long]()
    def dominated(y: Long, z: Long): Boolean = {
      val e = m.higherEntry(y)
      e != null && e.getValue > z
    }
    def insert(y: Long, z: Long): Unit = {
      val c = m.ceilingEntry(y)
      if (c != null && c.getValue >= z) return // weakly dominated: no new coverage
      var f = m.floorEntry(y)
      while (f != null && f.getValue <= z) { m.remove(f.getKey); f = m.floorEntry(y) }
      m.put(y, z)
    }
    def size: Int = m.size
    def toPairs: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
      out
    }
  }

  /** 3-D Pareto frontier: rows no other row strictly dominates on ALL of
    * (x, y, z) — the 3-criteria trade-off filter (quality × length ×
    * recency corpus curation, cost × latency × accuracy sweeps).
    *
    * The 2-D staircase generalizes by one dimension of SORT: range-
    * partition + sort on x DESCENDING (TeraSort — equal x co-locate, so
    * partition p's x are strictly greater than partition p+1's), then a
    * point is dominated iff the (y, z) [[Frontier]] of all points with
    * STRICTLY greater x covers it. Two jobs over ONE shuffle (the
    * [[PrefixSum]] reused-shuffle discipline):
    *   1. per-partition (y, z) frontier → driver exclusive `scanLeft`
    *      merge → broadcast (the count-sentinel protocol,
    *      `/root/reference/src/SlidingAggregation.java:159-210`, with
    *      frontiers in place of counts);
    *   2. per-partition x-desc sweep seeded with the prefix frontier:
    *      buffer each equal-x run (equal x never dominates in x), test
    *      against the frontier, then fold the run in.
    * Never the O(n²) dominance anti-join. The cross-partition state is
    * output-sensitive — O(|2-D maxima of the prefix|) per partition, the
    * skyline analogue of [[OrderStats]]' splitter tables; real trade-off
    * data keeps it tiny. The anti-correlated worst case degrades the
    * DRIVER merge first, not the executors, so the collected total is
    * ENFORCED against `maxFrontierPoints` (default 2^20) — exceeding it
    * raises with the observed size rather than silently becoming a
    * driver-bound job.
    *
    * NULL in any criterion drops the row (dominance over NULL is
    * undefined); ties survive on every axis (equal is not strict
    * dominance). `numParts <= 0` derives the partition count from
    * default parallelism; the surviving SET is partition-count
    * independent. */
  def pareto3d(df: DataFrame, x: String, y: String, z: String,
               numParts: Int = 0,
               maxFrontierPoints: Long = 1L << 20,
               frontierPointsOut: Option[java.util.concurrent.atomic.AtomicLong] = None): DataFrame = {
    val crit = Seq(x, y, z)
    require(crit.distinct.size == 3,
      s"skyline needs three distinct criteria, got ${crit.mkString(", ")}")
    crit.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"), s"column name '$c' collides with internal __* names")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
    }
    val spark = df.sparkSession
    val parts = if (numParts >= 1) numParts
      else math.max(2, spark.sparkContext.defaultParallelism)
    val pts = df.filter(col(x).isNotNull && col(y).isNotNull && col(z).isNotNull)
    // cache before the range shuffle (RangePartitioner samples its child
    // once, the shuffle map scans it again) — the PrefixSum discipline
    val (src, release) = RangeInputCache.acquire(pts)
    val sorted = src.repartitionByRange(parts, col(x).desc)
      .sortWithinPartitions(col(x).desc)
    val xi = sorted.schema.fieldIndex(x)
    val yi = sorted.schema.fieldIndex(y)
    val zi = sorted.schema.fieldIndex(z)
    // one RDD object: the frontier job writes the shuffle files the sweep
    // job re-reads (skipped map stage) — data moves once
    val rdd = sorted.rdd
    val partFrontiers = rdd.mapPartitions({ it =>
      val f = new Frontier
      it.foreach(r => f.insert(r.getLong(yi), r.getLong(zi)))
      Iterator.single(f.toPairs)
    }, preservesPartitioning = true).collect()
    release() // the shuffle files hold the sorted data now
    // ENFORCED budget on the output-sensitive cross-partition state (the
    // joinProfile discipline): the per-partition (y, z) frontiers just
    // collected bound both the driver merge (O(total·log)) and the prefix
    // broadcast (≤ parts·total pairs). Real trade-off data keeps totals
    // tiny; ANTI-CORRELATED (y, z) within x-runs makes every point a 2-D
    // maximum and the total O(n) — raise instead of silently becoming a
    // driver-bound job. Callers with driver memory to match may raise the
    // cap explicitly.
    val frontierPoints = partFrontiers.iterator.map(_.length.toLong).sum
    frontierPointsOut.foreach(_.set(frontierPoints)) // observability (probes)
    require(frontierPoints <= maxFrontierPoints,
      s"pareto3d: cross-partition frontier carries $frontierPoints points " +
        s"(cap $maxFrontierPoints) — the (y, z) prefix state is output-" +
        "sensitive and this input (anti-correlated y/z?) exceeds the " +
        "driver-merge budget; raise maxFrontierPoints only with driver " +
        "memory to match")
    // exclusive prefix merge: prefix(p) = frontier of partitions 0..p-1,
    // all of whose x strictly exceed partition p's
    val acc = new Frontier
    val prefixes = partFrontiers.map { pairs =>
      val snap = acc.toPairs
      pairs.foreach { case (py, pz) => acc.insert(py, pz) }
      snap
    }
    val bPrefix = spark.sparkContext.broadcast(prefixes)
    val outSchema = sorted.schema
    val survivors = rdd.mapPartitionsWithIndex { (pi, it) =>
      val f = new Frontier
      bPrefix.value(pi).foreach { case (py, pz) => f.insert(py, pz) }
      val run = scala.collection.mutable.ArrayBuffer.empty[Row]
      var curX = 0L
      var open = false
      def foldRun(): Unit = {
        run.foreach(r => f.insert(r.getLong(yi), r.getLong(zi)))
        run.clear()
      }
      it.flatMap { r =>
        val rx = r.getLong(xi)
        if (!open || rx != curX) { foldRun(); curX = rx; open = true }
        run += r
        if (f.dominated(r.getLong(yi), r.getLong(zi))) None else Some(r)
      }
    }
    spark.createDataFrame(survivors, outSchema)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}

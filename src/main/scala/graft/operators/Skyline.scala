package graft.operators

import org.apache.spark.RangePartitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

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
    * DRIVER merge first, not the executors, so `maxFrontierPoints`
    * (default 2^20) budgets the driver path BEFORE anything large is
    * collected: each partition ships its frontier pairs only when they
    * fit its per-partition quota (`cap / parts` — so the collect itself
    * is bounded by the cap, not just the merge after it), and an input
    * that exceeds the budget switches to [[paretoSweepDistributed]] —
    * a SECOND y-descending staircase sweep that answers every
    * cross-partition dominance probe with a per-x-partition prefix-max
    * Fenwick tree, O(parts²) driver state, never O(n). The answer SET is
    * identical on both paths; the budget only picks the execution shape.
    *
    * NULL in any criterion drops the row (dominance over NULL is
    * undefined); ties survive on every axis (equal is not strict
    * dominance). `numParts <= 0` derives the partition count from
    * default parallelism; the surviving SET is partition-count
    * independent. `usedDistributedOut` observes which path ran. */
  def pareto3d(df: DataFrame, x: String, y: String, z: String,
               numParts: Int = 0,
               maxFrontierPoints: Long = 1L << 20,
               frontierPointsOut: Option[java.util.concurrent.atomic.AtomicLong] = None,
               usedDistributedOut: Option[java.util.concurrent.atomic.AtomicBoolean] = None): DataFrame = {
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
    // BUDGETED frontier collect (the joinProfile discipline, tightened
    // r14): each partition ships its (y, z) frontier pairs only when they
    // fit the per-partition quota, so the collect itself — not just the
    // merge after it — is bounded by the cap. Sizes always come back
    // (O(parts) longs), so the budget decision is made from measurements,
    // never by an OOM.
    val quota = math.max(1L, maxFrontierPoints / parts)
    val partStats: Array[(Long, Array[(Long, Long)])] =
      rdd.mapPartitions({ it =>
        val f = new Frontier
        it.foreach(r => f.insert(r.getLong(yi), r.getLong(zi)))
        Iterator.single(
          (f.size.toLong, if (f.size <= quota) f.toPairs else null))
      }, preservesPartitioning = true).collect()
    release() // the shuffle files hold the sorted data now
    val frontierPoints = partStats.iterator.map(_._1).sum
    frontierPointsOut.foreach(_.set(frontierPoints)) // observability (probes)
    val driverPath = frontierPoints <= maxFrontierPoints &&
      partStats.forall(_._2 != null)
    usedDistributedOut.foreach(_.set(!driverPath))
    val outSchema = sorted.schema
    val survivors = if (!driverPath) {
      // ANTI-CORRELATED regime (the r13 probe's O(n)-frontier planes):
      // refuse the driver merge, run the distributed second sweep instead
      paretoSweepDistributed(rdd, parts, xi, yi, zi)
    } else {
      // exclusive prefix merge: prefix(p) = frontier of partitions 0..p-1,
      // all of whose x strictly exceed partition p's
      val acc = new Frontier
      val prefixes = partStats.map { case (_, pairs) =>
        val snap = acc.toPairs
        pairs.foreach { case (py, pz) => acc.insert(py, pz) }
        snap
      }
      val bPrefix = spark.sparkContext.broadcast(prefixes)
      rdd.mapPartitionsWithIndex { (pi, it) =>
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
    }
    spark.createDataFrame(survivors, outSchema)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Fenwick (binary indexed) tree for PREFIX MAX over a fixed index
    * domain [0, n) — point updates only ever grow values, which is
    * exactly the monotone case the classic max-BIT supports. */
  private[graft] final class MaxBit(n: Int) extends Serializable {
    private val t = Array.fill(n + 1)(Long.MinValue)
    def update(i: Int, v: Long): Unit = {
      var j = i + 1
      while (j <= n) { if (v > t(j)) t(j) = v; j += j & -j }
    }
    /** max over indices [0, i]; Long.MinValue when empty. */
    def prefixMax(i: Int): Long = {
      var j = math.min(i + 1, n)
      var m = Long.MinValue
      while (j > 0) { if (t(j) > m) m = t(j); j -= j & -j }
      m
    }
  }

  /** The distributed cross-partition dominance test — the fallback the
    * anti-correlated regime takes when the per-partition (y, z)
    * frontiers exceed the driver-merge budget.
    *
    * Point r in x-partition p (x sorted DESCENDING, so partitions q < p
    * hold strictly greater x after the equal-x-run handling below) is
    * dominated across partitions iff some frontier point f of a
    * partition q < p has f.y > r.y ∧ f.z > r.z — i.e. iff
    * `max{ f.z : f.pi < p, f.y > r.y } > r.z`. That is a 2-D
    * dominance-max query answered by ONE MORE staircase sweep, this time
    * over y DESCENDING:
    *
    *  1. per x-partition, the local sweep (empty prefix) drops
    *     locally-dominated points and emits the survivors as QUERIES
    *     `(y, pi, z, row)` plus the partition's full (y, z) frontier as
    *     INSERTS `(y, pi, z)` — O(n + frontier) rows, all distributed;
    *  2. range-partition + sort the union by (y DESC, queries-first) —
    *     queries at a tied y must not see tied inserts (strict >);
    *  3. per y-partition, a [[MaxBit]] over the x-partition index
    *     answers each query's `max z over pi' < pi` in O(log parts);
    *     the Fenwick state a y-partition needs from its predecessors is
    *     one (pi → max z) array — O(parts) longs — so the cross-partition
    *     carry is an O(parts²) driver scan-merge (the [[PrefixSum]]
    *     count-sentinel discipline), INDEPENDENT of frontier size.
    *
    * Wall shape: one extra O(n) shuffle + two bounded jobs; driver and
    * broadcast state O(parts²) longs — at 1000 executors ~8 MB, where
    * the driver merge this replaces would carry O(n) points. */
  private[graft] def paretoSweepDistributed(
      rdd: org.apache.spark.rdd.RDD[Row], parts: Int,
      xi: Int, yi: Int, zi: Int): org.apache.spark.rdd.RDD[Row] = {
    // key: (y, kind) — kind 0 = query, 1 = frontier insert; y DESC with
    // queries before inserts at tied y (strict-dominance tie rule)
    implicit val kOrd: Ordering[(Long, Int)] = new Ordering[(Long, Int)] {
      def compare(a: (Long, Int), b: (Long, Int)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else Integer.compare(a._2, b._2)
      }
    }
    val kv = rdd.mapPartitionsWithIndex { (pi, it) =>
      val f = new Frontier
      val run = scala.collection.mutable.ArrayBuffer.empty[Row]
      var curX = 0L
      var open = false
      def foldRun(): Unit = {
        run.foreach(r => f.insert(r.getLong(yi), r.getLong(zi)))
        run.clear()
      }
      val queries = it.flatMap { r =>
        val rx = r.getLong(xi)
        if (!open || rx != curX) { foldRun(); curX = rx; open = true }
        run += r
        if (f.dominated(r.getLong(yi), r.getLong(zi))) None
        else Some(((r.getLong(yi), 0), (pi, r.getLong(zi), r)))
      }
      // Iterator.++ is by-name: the block runs only after `queries` is
      // exhausted, when f holds the partition's complete (y, z) frontier
      queries ++ {
        foldRun()
        f.toPairs.iterator.map { case (fy, fz) =>
          ((fy, 1), (pi, fz, null: Row))
        }
      }
    }
    // the RangePartitioner sampling job and the shuffle map stage both
    // consume kv — cache so the local sweep runs once (the
    // RangeInputCache discipline, RDD-level)
    kv.persist(StorageLevel.MEMORY_AND_DISK)
    val partitioned = kv.repartitionAndSortWithinPartitions(
      new RangePartitioner(parts, kv))
    // per y-partition summary of its INSERTS: (x-partition → max z) —
    // O(parts) longs each, O(parts²) total on the driver
    val summaries = partitioned.mapPartitions({ it =>
      val arr = Array.fill(parts)(Long.MinValue)
      it.foreach { case ((_, kind), (pi, zz, _)) =>
        if (kind == 1 && zz > arr(pi)) arr(pi) = zz
      }
      Iterator.single(arr)
    }, preservesPartitioning = true).collect()
    kv.unpersist(blocking = false) // the y-shuffle files hold the data now
    // exclusive prefix: what partitions ABOVE this y-partition inserted
    val prefix = Array.ofDim[Array[Long]](summaries.length)
    val acc = Array.fill(parts)(Long.MinValue)
    for (q <- summaries.indices) {
      prefix(q) = acc.clone()
      val s = summaries(q)
      var i = 0
      while (i < parts) { if (s(i) > acc(i)) acc(i) = s(i); i += 1 }
    }
    val bPrefix = rdd.sparkContext.broadcast(prefix)
    partitioned.mapPartitionsWithIndex { (qi, it) =>
      val bit = new MaxBit(parts)
      val seed = bPrefix.value(qi)
      var i = 0
      while (i < parts) {
        if (seed(i) != Long.MinValue) bit.update(i, seed(i))
        i += 1
      }
      it.flatMap { case ((_, kind), (pi, zz, row)) =>
        if (kind == 1) { bit.update(pi, zz); None }
        else if (pi > 0 && bit.prefixMax(pi - 1) > zz) None
        else Some(row)
      }
    }
  }
}

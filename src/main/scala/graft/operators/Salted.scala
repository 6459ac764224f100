package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's skew
  * split can't help (e.g. a shuffle hash join where ONE key holds a double-
  * digit percentage of all rows, so even split sub-partitions hotspot).
  *
  * `join` replicates the (small-ish) right side `factor` times, one copy
  * per salt value, and spreads the left side's hot keys across the salted
  * composite key deterministically (hash of a distinguishing left column,
  * NOT a random — reruns must produce identical partitioning for
  * reproducible plans and tests). The join key becomes (key, salt), so a
  * key that held p% of rows now holds p/factor% per shuffle partition.
  *
  * Cost: right side × factor. When the right side is too large to
  * replicate whole, pass `hotKeys` (the skewed key values, a frame with a
  * `key` column — [[hotKeys]] computes it by frequency) and only the hot
  * slice pays the ×factor replication; the rest goes through a plain
  * equi-join and the two branches union. Result-identical to the full-salt
  * form and to the plain join (spec-gated).
  */
object Salted {

  def join(left: DataFrame, right: DataFrame, key: String,
           saltCol: String, factor: Int,
           hotKeys: Option[DataFrame] = None): DataFrame = {
    // factor = 0 would yield pmod NULL on the left and salts {0, -1} on
    // the right — a silently EMPTY join result, not an error
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    Seq(left -> "left", right -> "right").foreach { case (df, side) =>
      require(!df.columns.contains("_salt"), // would be overwritten + dropped
        s"$side input already has a '_salt' column")
    }
    hotKeys match {
      case None => saltedJoin(left, right, key, saltCol, factor)
      case Some(hot) =>
        require(hot.columns.contains(key),
          s"hotKeys frame needs a '$key' column, has ${hot.columns.mkString(",")}")
        // the hot-key set is small by construction (it is the handful of
        // skewed keys) — broadcast it through all four splits so the
        // routing costs no exchange
        val hk = broadcast(hot.select(key).distinct())
        val salted = saltedJoin(
          left.join(hk, Seq(key), "left_semi"),
          right.join(hk, Seq(key), "left_semi"), key, saltCol, factor)
        val plain = left.join(hk, Seq(key), "left_anti")
          .join(right.join(hk, Seq(key), "left_anti"), Seq(key))
        // keys split disjointly and an equi-join only matches equal keys,
        // so the two branches partition the plain join's rows exactly
        salted.unionByName(plain)
    }
  }

  private def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                         saltCol: String, factor: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(saltCol)), lit(factor.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** CMS-PLANNED join — the [[CountMinSketch.estimateJoinSize]] consumer
    * (the r14-verdict "estimator without a planner" gap): reads the join
    * strategy from two O(depth·width) count-sketch vectors of the key
    * columns and DISPATCHES it, so the strategy choice costs two narrow
    * aggregation passes (or nothing, when the sketches are already
    * stored — [[planFromSketches]]) instead of a mis-planned join.
    *
    *   - 'broadcast' → the smaller side ships with an explicit
    *     `broadcast()` hint (no shuffle);
    *   - 'salted'    → [[join]] with [[hotKeys]]-detected hot keys (the
    *     hot slice pays ×factor, the cold slice joins plain);
    *   - 'shuffle'   → the plain co-partitioned equi-join.
    *
    * All three produce the identical result (spec-gated on planted
    * skew); only the physical shape differs. Skew handling salts the
    * LEFT side's hot keys ([[join]]'s contract) — put the skewed table
    * on the left. `hotMinShare1e6` sets the exact hot-key detection
    * threshold (ppm of the left side's rows) for the salted branch;
    * the decision thresholds mirror [[CountMinSketch.joinStrategy]]. */
  def autoJoin(left: DataFrame, right: DataFrame, key: String,
               saltCol: String, factor: Int, broadcastRows: Long,
               skewShare1e6: Long = 200000L, skewMinRows: Long = 1000000L,
               hotMinShare1e6: Long = 50000L,
               depth: Int = 4, width: Int = 128): DataFrame = {
    val (strategy, leftRows, rightRows) = plan(left, right, key,
      broadcastRows, skewShare1e6, skewMinRows, depth, width)
    strategy match {
      case "broadcast" =>
        // hint the SMALLER side; left stays the left side of the join
        // either way, so the output column layout is strategy-invariant
        if (leftRows <= rightRows) broadcast(left).join(right, Seq(key))
        else left.join(broadcast(right), Seq(key))
      case "salted" =>
        val minCount = math.max(2L, leftRows * hotMinShare1e6 / 1000000L)
        join(left, right, key, saltCol, factor,
          hotKeys = Some(hotKeys(left, key, minCount)))
      case _ => left.join(right, Seq(key))
    }
  }

  /** The strategy decision of [[autoJoin]], exposed for specs/callers:
    * builds the two global count sketches (one narrow aggregation pass
    * per side) and reads ([[CountMinSketch.joinStrategy]], left row
    * count, right row count) from them. */
  def plan(left: DataFrame, right: DataFrame, key: String,
           broadcastRows: Long, skewShare1e6: Long = 200000L,
           skewMinRows: Long = 1000000L,
           depth: Int = 4, width: Int = 128): (String, Long, Long) = {
    val a = CountMinSketch.sketch(left.select(col(key)), Seq.empty, key,
      depth, width, out = "a")
    val b = CountMinSketch.sketch(right.select(col(key)), Seq.empty, key,
      depth, width, out = "b")
    planFromSketches(a.crossJoin(b), "a", "b", broadcastRows, skewShare1e6,
      skewMinRows, depth, width)
  }

  /** [[plan]] over STORED sketch vectors — the zero-pass form: `sk` is
    * one row carrying both count-sketch arrays (weights = 1 by contract,
    * so totals read exact row counts). */
  def planFromSketches(sk: DataFrame, aCol: String, bCol: String,
                       broadcastRows: Long, skewShare1e6: Long = 200000L,
                       skewMinRows: Long = 1000000L,
                       depth: Int = 4, width: Int = 128): (String, Long, Long) = {
    val r = sk.select(
      CountMinSketch.joinStrategy(col(aCol), col(bCol), depth, width,
        broadcastRows, skewShare1e6, skewMinRows).as("strategy"),
      CountMinSketch.total(col(aCol), width).as("ra"),
      CountMinSketch.total(col(bCol), width).as("rb")).head()
    (r.getString(0), r.getLong(1), r.getLong(2))
  }

  /** The keys of `df` holding at least `minCount` rows — the usual input
    * to [[join]]'s `hotKeys`. One aggregation over `df`; the output is
    * tiny (only genuinely skewed keys pass any sensible threshold). */
  def hotKeys(df: DataFrame, key: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    df.groupBy(key).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minCount)
      .select(key)
  }
}

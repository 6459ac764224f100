package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join — the join shape Spark has no equi-key
  * for: `start <= point <= end` alone plans as BroadcastNestedLoopJoin
  * (broadcast one whole side) or a cartesian product, both non-starters
  * at scale.
  *
  * Bucketed form: pick a bucket width B; each interval is exploded to the
  * `(end-start)/B + 1` buckets it overlaps, each point computes its single
  * bucket, and the join becomes a plain EQUI-join on the bucket id with
  * the precise range predicate as a post-join filter. A (point, interval)
  * pair can meet in at most ONE bucket (the point's), so no dedup pass is
  * needed. Cost: |points| + |intervals|·(avgSpan/B + 1) shuffled rows —
  * choose B near the typical interval length so the explosion factor
  * stays ~2. Skew note: the bucket id inherits the time distribution;
  * hot buckets respond to AQE skew handling or salting like any equi key.
  */
object RangeJoin {

  /** Internal bucket column — deliberately namespaced; inputs carrying the
    * same name are rejected rather than silently overwritten. */
  val bucketCol = "__graft_range_bucket"

  /** Joins `points` (with BIGINT column `pointCol`) to `intervals` (with
    * BIGINT columns `startCol`, `endCol`, inclusive ends, start <= end)
    * on containment. Output: all columns of both inputs, one row per
    * matching pair. Column names must not collide across the two inputs
    * (alias before calling).
    *
    * `maxBucketsPerInterval` bounds the per-row explode: an interval
    * spanning more buckets than that (huge span vs tiny `bucketWidth`)
    * raises a sized, actionable error instead of building a giant per-row
    * array and dying with an executor OOM or sequence-length overflow. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    require(!points.columns.contains(bucketCol) && !intervals.columns.contains(bucketCol),
      s"inputs must not contain the internal column name $bucketCol")
    // exact long floor-division: SQL `div` truncates toward zero (wrong for
    // negative timestamps), so subtract the always-non-negative pmod first.
    // All-integer arithmetic — a double cast is exact floor only for
    // |values| <= 2^53 and would let bucket sizing drift beyond that.
    def bucketOf(c: String) =
      expr(s"((`$c` - pmod(`$c`, $bucketWidth)) div $bucketWidth)")
    val pts = points.withColumn(bucketCol, bucketOf(pointCol))
    val bStart = bucketOf(startCol)
    val bEnd = bucketOf(endCol)
    // both directions guarded: an INVERTED interval (end < start — one
    // corrupt row) would otherwise slip past the span bound with a
    // negative bucket delta and make sequence() emit a DESCENDING run —
    // exactly the unbounded per-row blowup the guard exists to stop
    val guardedEnd = when(
        bEnd - bStart >= 0 && bEnd - bStart < lit(maxBucketsPerInterval), bEnd)
      .otherwise(raise_error(format_string(
        "interval [%s, %s] is inverted (end < start) or spans more than " +
          s"maxBucketsPerInterval=$maxBucketsPerInterval buckets at " +
          s"bucketWidth=$bucketWidth — fix the interval, increase " +
          "bucketWidth, or raise the bound",
        col(startCol), col(endCol))))
    val ivs = intervals.withColumn(bucketCol, explode(sequence(bStart, guardedEnd)))
    pts.join(ivs, Seq(bucketCol))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop(bucketCol)
  }

  /** Interval × interval OVERLAP join — both sides are ranges (inclusive
    * ends): emit one row per (left, right) pair with
    * `lStart <= rEnd AND rStart <= lEnd`. The generalization of
    * [[pointInInterval]] (a point is a zero-length interval); covers
    * meeting/booking conflicts, session-vs-incident attribution, validity
    * overlap between two SCD dimensions.
    *
    * Same bucket construction on BOTH sides: each interval explodes to the
    * buckets it covers and the join is a plain equi-join on the bucket id.
    * Two overlapping intervals co-occupy every bucket their intersection
    * touches, so the naive form would duplicate pairs; instead of a
    * `distinct` (an extra full-width shuffle), the match is kept ONLY in
    * the deterministic first shared bucket — `greatest(bucket(lStart),
    * bucket(rStart))` — which any overlapping pair occupies exactly once.
    * Cost: each side shuffles span/B + 1 copies per row; pick `bucketWidth`
    * near the typical interval length of the DENSER side. Column names
    * must not collide across inputs (alias before calling). */
  def intervalOverlap(left: DataFrame, lStartCol: String, lEndCol: String,
                      right: DataFrame, rStartCol: String, rEndCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    require(!left.columns.contains(bucketCol) && !right.columns.contains(bucketCol),
      s"inputs must not contain the internal column name $bucketCol")
    def bucketOf(c: String) =
      expr(s"((`$c` - pmod(`$c`, $bucketWidth)) div $bucketWidth)")
    def exploded(df: DataFrame, startCol: String, endCol: String) = {
      val bStart = bucketOf(startCol)
      val bEnd = bucketOf(endCol)
      // inverted intervals (end < start) raise rather than exploding a
      // descending sequence or being silently dropped by the
      // first-shared-bucket keep rule — same both-directions guard as
      // [[pointInInterval]]
      val guardedEnd = when(
          bEnd - bStart >= 0 && bEnd - bStart < lit(maxBucketsPerInterval), bEnd)
        .otherwise(raise_error(format_string(
          "interval [%s, %s] is inverted (end < start) or spans more than " +
            s"maxBucketsPerInterval=$maxBucketsPerInterval buckets at " +
            s"bucketWidth=$bucketWidth — fix the interval, increase " +
            "bucketWidth, or raise the bound",
          col(startCol), col(endCol))))
      df.withColumn(bucketCol, explode(sequence(bStart, guardedEnd)))
    }
    exploded(left, lStartCol, lEndCol)
      .join(exploded(right, rStartCol, rEndCol), Seq(bucketCol))
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      // keep each pair exactly once: in the first bucket both occupy
      .filter(col(bucketCol) ===
        greatest(bucketOf(lStartCol), bucketOf(rStartCol)))
      .drop(bucketCol)
  }
}

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

  /** Joins `points` (with BIGINT column `pointCol`) to `intervals` (with
    * BIGINT columns `startCol`, `endCol`, inclusive ends, start <= end)
    * on containment. Output: all columns of both inputs, one row per
    * matching pair. Column names must not collide across the two inputs
    * (alias before calling). */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    // floor(x / B) (not integer `div`, which truncates toward zero and
    // mis-buckets negative timestamps)
    def bucketOf(c: String) = floor(col(c).cast("double") / bucketWidth).cast(LongType)
    val pts = points.withColumn("__bucket", bucketOf(pointCol))
    val ivs = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    pts.join(ivs, Seq("__bucket"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}

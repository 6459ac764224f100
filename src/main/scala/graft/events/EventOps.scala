package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table — the reference's
  * rank-window math (`/root/reference/src/SlidingAggregation.java:255-430`)
  * generalized from ROWS frames over a global rank to RANGE frames over
  * event time, per key.
  *
  * Time base: timestamps arrive as Long nanoseconds
  * (`spark.sql.legacy.parquet.nanosAsLong=true`) and are floored to
  * MICROSECONDS (`ts div 1000`) — DuckDB's parquet reader converts ns to
  * µs by TRUNCATION toward zero (verified: -1500 ns reads as -1 µs, -1 ns
  * as 0), and SQL `div` truncates the same way, so the two engines agree
  * at every timestamp INCLUDING pre-1970 ones; a floor division here
  * would disagree with the oracle on negative ns. µs is the largest
  * cross-engine-exact resolution.
  *
  * Scale: both operators shuffle ONCE on the partition key (`user_id`);
  * within a key Spark's WindowExec streams with a spillable sort. Skewed
  * users would be handled by AQE or key salting; no global ordering is
  * required anywhere.
  */
object EventOps {

  private def base(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("user_id"),
      expr("CAST(ts div 1000 AS BIGINT)").as("tus"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("v"))

  /** Trailing event-time window per user: sum + count of `value` cents over
    * [t − windowSec, t] inclusive. Output:
    * (event_id, user_id, win_sum_c, win_cnt). */
  def trailingWindow(events: DataFrame, windowSec: Long): DataFrame = {
    val us = windowSec * 1000000L
    val w = Window.partitionBy("user_id").orderBy("tus").rangeBetween(-us, 0)
    base(events)
      .select(col("event_id"), col("user_id"),
        sum("v").over(w).as("win_sum_c"),
        count(lit(1)).over(w).as("win_cnt"))
      .orderBy("event_id")
  }

  /** Sessionization: a new session starts when the gap to the user's
    * previous event exceeds `gapSec`. Output: (event_id, user_id,
    * session_id) with session ids numbered 1.. per user in time order. */
  def sessionize(events: DataFrame, gapSec: Long): DataFrame = {
    val us = gapSec * 1000000L
    val order = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base(events)
      .withColumn("prev", lag("tus", 1).over(order))
      .withColumn("is_new",
        when(col("prev").isNull || col("tus") - col("prev") > us, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(cum).cast(LongType))
      .select("event_id", "user_id", "session_id")
      .orderBy("event_id")
  }
}

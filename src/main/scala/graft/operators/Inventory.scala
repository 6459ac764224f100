package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** FIFO lot matching — which buy lots does each sell consume, and how
  * much of each? The inventory/cost-basis primitive (consume oldest
  * stock first), usually written as a sequential loop; here as a CLOSED
  * FORM: per key, cumulative quantity turns the buy sequence into
  * half-open intervals [cum_before, cum_before + qty) tiling
  * [0, total_buys), sells likewise tile [0, total_sells), and FIFO
  * matching IS the interval intersection of the two tilings — sell s
  * consumes min(ends) − max(starts) units of every buy lot its
  * cumulative interval overlaps. No loop, no recursion; two prefix-sum
  * windows and one bucketed equi-join.
  *
  * The pairing uses the [[graft.events.RangeJoin]] bucket discipline
  * with the KEY IN THE JOIN KEY: both interval sets explode to the
  * cumulative-quantity buckets they span (width `qtyBucket`), the join
  * is a plain equi-join on (key, bucket), and each overlapping pair is
  * kept only in its deterministic first shared bucket — no dedup pass.
  * Pick `qtyBucket` near the typical lot size; a lot spanning more than
  * `maxBucketsPerLot` buckets raises (the guarded-explode rule).
  */
object Inventory {

  /** @param buys  (key, id, qty, seq) — qty > 0, FIFO order = (seq, id)
    * @param sells same shape
    * @return (key, buy_id, sell_id, qty) — matched units per (buy lot,
    *         sell) pair, ordered; unmatched tails (excess stock or
    *         oversold) simply produce no row. */
  def fifoMatch(buys: DataFrame, sells: DataFrame, key: String, id: String,
                qtyCol: String, seqCol: String, qtyBucket: Long,
                maxBucketsPerLot: Long = 1L << 16): DataFrame = {
    require(qtyBucket >= 1, s"qtyBucket must be >= 1, got $qtyBucket")
    require(maxBucketsPerLot >= 1, "maxBucketsPerLot must be >= 1")
    val reserved = Set("s0", "s1", "t0", "t1", "buy_id", "sell_id", "qty")
    Seq(key, id, qtyCol, seqCol).foreach(c => require(
      !reserved.contains(c) && !c.startsWith("__"),
      s"fifoMatch: column name '$c' collides with an internal/output name"))
    def side(df: DataFrame, tag: String) = {
      val q = when(col(qtyCol).isNotNull && col(qtyCol) > 0, col(qtyCol))
        .otherwise(raise_error(format_string(
          s"fifoMatch: $tag qty %s must be positive non-NULL", col(qtyCol))))
      val w = Window.partitionBy(key).orderBy(col(seqCol), col(id))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__q", q.cast(LongType))
        .withColumn("__s0", coalesce(sum("__q").over(w), lit(0L)))
        .select(col(key).as("__k"), col(id).cast(LongType).as(s"${tag}_id"),
          col("__s0").as("s0"), (col("__s0") + col("__q")).as("s1"))
    }
    def bucketOf(c: String) =
      expr(s"(($c - pmod($c, ${qtyBucket}L)) div ${qtyBucket}L)")
    def exploded(df: DataFrame) = {
      // s1 is exclusive — the last occupied bucket is bucket(s1 − 1);
      // qty > 0 guarantees s1 − 1 >= s0 so the sequence never inverts
      val bStart = bucketOf("s0")
      val bEnd = bucketOf("(s1 - 1)")
      val guarded = when(bEnd - bStart < lit(maxBucketsPerLot), bEnd)
        .otherwise(raise_error(format_string(
          "fifoMatch: lot [%s, %s) spans more than " +
            s"maxBucketsPerLot=$maxBucketsPerLot buckets at " +
            s"qtyBucket=$qtyBucket — increase qtyBucket or the bound",
          col("s0"), col("s1"))))
      df.withColumn("__qb", explode(sequence(bStart, guarded)))
    }
    val b = exploded(side(buys, "buy"))
    val s = exploded(side(sells, "sell"))
      .withColumnRenamed("s0", "t0").withColumnRenamed("s1", "t1")
    b.join(s, Seq("__k", "__qb"))
      .filter(col("s0") < col("t1") && col("t0") < col("s1"))
      // keep each overlapping pair exactly once: first shared bucket
      .filter(col("__qb") === greatest(bucketOf("s0"), bucketOf("t0")))
      .select(col("__k").as(key), col("buy_id"), col("sell_id"),
        (least(col("s1"), col("t1")) - greatest(col("s0"), col("t0")))
          .as("qty"))
      .orderBy(key, "buy_id", "sell_id")
  }
}

package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Stats barrier for `localCheckpoint` results.
  *
  * Spark 4's `Dataset.localCheckpoint` builds its `LogicalRDD` leaf with
  * `originStats` copied from the origin plan
  * (`LogicalRDD.fromDataset`). For an ITERATIVE operator (connected
  * components, k-means refine, BPE merge rounds) whose round output is
  * checkpointed and fed into the next round's joins, that propagation is
  * quadratic in a vicious way: `SizeInBytesOnlyStatsPlanVisitor.visitJoin`
  * MULTIPLIES child `sizeInBytes`, so the estimate roughly squares every
  * round and its BigInt bit-count DOUBLES — measured 26 bits → 101,425
  * bits in 12 self-join rounds, and a 20-round CC at sf0.1 plans
  * multi-million-bit Toom-Cook multiplications, hanging the driver for
  * minutes per round (the q91 bench hang, round 9).
  *
  * The barrier rebuilds the checkpoint leaf with the SAME rdd/output/
  * partitioning but bounded statistics: the origin's estimate clamped to
  * `Long.MaxValue` (the classic `defaultSizeInBytes` ceiling). Every
  * checkpoint leaf is then ≤ 2^63, so per-round stats stay a product of a
  * few 63-bit factors — constant-size BigInts, zero planning blowup —
  * while genuinely-small checkpoints keep a truthful size for broadcast
  * decisions.
  *
  * Lives in `org.apache.spark.sql.execution` for `private[sql]` access to
  * `classic.Dataset.ofRows`; uses only public accessors of the
  * `LogicalRDD` case class. */
object GraftStatsBarrier {

  private val Cap = BigInt(Long.MaxValue)

  /** `cp` must be a `localCheckpoint` result (analyzed plan = LogicalRDD
    * leaf); returns it re-wrapped with bounded stats. Any other frame is
    * returned unchanged.
    *
    * Constraints are FORWARDED, not dropped: the origin leaf's
    * `constraints` (public, and already rewritten by `fromDataset` to the
    * checkpoint's own output attributes — which the rebuilt leaf reuses
    * verbatim, so no further rewrite is needed) become the new leaf's
    * `originConstraints`. Only the statistics are replaced; the not-null /
    * equality facts Spark 4 propagates onto checkpoints keep feeding
    * downstream constraint-based pruning. */
  def rebuildWithBoundedStats(cp: DataFrame, originSizeInBytes: BigInt): DataFrame =
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val spark = cp.sparkSession.asInstanceOf[ClassicSparkSession]
        val bounded = Statistics(
          sizeInBytes = originSizeInBytes.min(Cap).max(BigInt(1)))
        val plan = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          spark, Some(bounded), Some(l.constraints))
        ClassicDataset.ofRows(spark, plan)
      case _ => cp
    }
}

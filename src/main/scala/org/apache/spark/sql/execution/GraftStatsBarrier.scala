package org.apache.spark.sql.execution

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning, RangePartitioning, UnknownPartitioning}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Stats + physical-property barrier for `localCheckpoint` results.
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
  * The barrier rebuilds the checkpoint leaf with the SAME rdd/output but:
  *
  *  - bounded statistics: the origin's estimate clamped to
  *    `Long.MaxValue` (the classic `defaultSizeInBytes` ceiling). Every
  *    checkpoint leaf is then ≤ 2^63, so per-round stats stay a product
  *    of a few 63-bit factors — constant-size BigInts, zero planning
  *    blowup — while genuinely-small checkpoints keep a truthful size
  *    for broadcast decisions.
  *
  *  - TRUTHFUL physical properties (r15 optimization round): this
  *    Spark's `fromDataset` leaves `outputPartitioning` at
  *    `UnknownPartitioning(0)`, so a checkpoint that was explicitly
  *    hash-partitioned for reuse (the once-partitioned edge table every
  *    fixed-point loop joins per round) silently loses that fact and
  *    every round re-exchanges or re-broadcasts the edges — measured as
  *    a per-round `BroadcastExchange` of the full edge table in the
  *    q111 round plan. The barrier reads the origin's EXECUTED final
  *    plan (`AdaptiveSparkPlanExec.finalPhysicalPlan` — the plan whose
  *    output rows the checkpointed RDD literally holds), and when its
  *    partitioning is a concrete hash/range partitioning (an explicit
  *    fixed-N repartition; AQE-coalesced exchanges report Unknown and
  *    stay Unknown), rewrites it onto the checkpoint's output attributes
  *    so downstream joins/aggregations can elide the exchange (guide
  *    §2.4: remove shuffles outright where data is already partitioned).
  *    The declared ordering is captured the same way, which lets
  *    sort-merge joins skip the per-round re-sort of a pre-sorted edge
  *    checkpoint.
  *
  * Lives in `org.apache.spark.sql.execution` for `private[sql]` access to
  * `classic.Dataset.ofRows`; uses only public accessors of the
  * `LogicalRDD` case class. */
object GraftStatsBarrier {

  private val Cap = BigInt(Long.MaxValue)

  /** `cp` must be a `localCheckpoint` result (analyzed plan = LogicalRDD
    * leaf); returns it re-wrapped with bounded stats and, when the
    * origin's executed plan proves one, a concrete output
    * partitioning/ordering. Any other frame is returned unchanged.
    *
    * Constraints are FORWARDED, not dropped: the origin leaf's
    * `constraints` (public, and already rewritten by `fromDataset` to the
    * checkpoint's own output attributes — which the rebuilt leaf reuses
    * verbatim, so no further rewrite is needed) become the new leaf's
    * `originConstraints`. */
  def rebuildWithBoundedStats(cp: DataFrame, originSizeInBytes: BigInt,
                              origin: Option[DataFrame] = None): DataFrame =
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val spark = cp.sparkSession.asInstanceOf[ClassicSparkSession]
        val bounded = Statistics(
          sizeInBytes = originSizeInBytes.min(Cap).max(BigInt(1)))
        val (part, ord) = origin.flatMap(executedProps(_, l.output))
          .getOrElse((l.outputPartitioning, l.outputOrdering))
        val plan = LogicalRDD(l.output, l.rdd, part, ord,
          l.isStreaming, l.stream)(
          spark, Some(bounded), Some(l.constraints))
        ClassicDataset.ofRows(spark, plan)
      case _ => cp
    }

  /** The origin's executed-final-plan partitioning/ordering, rewritten
    * onto the checkpoint leaf's output attributes (positional map — the
    * leaf's output mirrors the origin's schema column for column). None
    * unless the partitioning is concretely hash/range AND every
    * referenced attribute maps; a lazily-checkpointed (not yet executed)
    * origin or an AQE-coalesced exchange yields None, keeping the old
    * Unknown behavior. */
  private def executedProps(origin: DataFrame, cpOutput: Seq[Attribute])
      : Option[(Partitioning, Seq[SortOrder])] = Try {
    val finalPlan = origin.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.finalPhysicalPlan
      case p => p
    }
    val idx = finalPlan.output.map(_.exprId).zipWithIndex.toMap
    def remap(e: Expression): Expression = e.transform {
      case a: AttributeReference =>
        cpOutput(idx(a.exprId)) // throws (→ None) when unmapped
    }
    val part: Option[Partitioning] = finalPlan.outputPartitioning match {
      case hp: HashPartitioning =>
        Some(HashPartitioning(hp.expressions.map(remap), hp.numPartitions))
      case rp: RangePartitioning =>
        Some(RangePartitioning(
          rp.ordering.map(o => remap(o).asInstanceOf[SortOrder]),
          rp.numPartitions))
      case _ => None
    }
    val ord: Seq[SortOrder] = finalPlan.outputOrdering.map { o =>
      SortOrder(remap(o.child), o.direction, o.nullOrdering, Seq.empty)
    }
    part.map(p => (p, ord))
  }.toOption.flatten
}

package graft.operators

import java.lang.ref.WeakReference

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Release handles for the corpus-scale intermediates graft operators
  * eagerly `localCheckpoint` (the shared signature tables of the Jaccard
  * joins, the LSH bucket/norm tables, the IVF centroid sample).
  *
  * A `localCheckpoint` pins its blocks in the block manager until the
  * backing RDD is garbage-collected — correct per query, but a long
  * session running many operators (the bench, a notebook, PipelineCli)
  * accumulates dead blocks at the GC's mercy. These handles make the
  * release explicit and deterministic, like [[graft.sources.Jsonl.release]]:
  *
  *  - [[release]](df) frees the blocks behind ONE returned frame. The
  *    frame — and anything derived from it that has not itself been
  *    materialized — is unusable afterwards (a checkpoint has no lineage
  *    to recompute from); call it only once the result is consumed.
  *  - [[releaseAll]]() frees every still-live checkpoint any graft
  *    operator created in this JVM. Between pipeline stages or bench
  *    queries this is the one-call cleanup.
  *
  * The registry holds WEAK references: a caller who never releases keeps
  * exactly the old behavior (ContextCleaner frees blocks once the frame
  * becomes unreachable) — nothing is pinned by the registry itself.
  */
object Checkpoints {
  private val live = scala.collection.mutable.ListBuffer.empty[WeakReference[RDD[_]]]
  // innermost scoped{} collector of the current thread, if any — operators
  // build their plans (and thus create checkpoints) on the calling thread
  private val scope = new ThreadLocal[scala.collection.mutable.ListBuffer[WeakReference[RDD[_]]]]

  /** `df.localCheckpoint(eager)` + registration — what graft operators
    * call instead of the raw method.
    *
    * The result is re-wrapped through
    * [[org.apache.spark.sql.execution.GraftStatsBarrier]]: Spark 4
    * propagates the origin plan's statistics onto the checkpoint leaf,
    * and in an iterative operator (CC / k-means / BPE rounds) the
    * size-only join estimator then SQUARES the estimate every round —
    * the BigInt's bit-count doubles per round until planning itself
    * spends minutes in Toom-Cook multiplication (the round-9 q91 bench
    * hang). Clamping at the checkpoint boundary keeps every leaf ≤ 2^63
    * — truthful for small frames, bounded for loop lineages. */
  /** `declare = true` additionally rebuilds the checkpoint leaf with the
    * origin's EXECUTED plan's concrete partitioning/ordering
    * (`fromDataset` loses them — see the barrier), so downstream joins
    * can elide exchanges/sorts. OPT-IN, for the explicitly repartitioned
    * loop inputs of the pinned (100 TB) regime only: declaring captured
    * partitioning on arbitrary checkpoints forces later exchanges to
    * match its partition count instead of letting AQE coalesce them —
    * measured as 64-task micro-stages replacing 1–5-task ones at bench
    * scale. */
  private[graft] def checkpoint(df: DataFrame, eager: Boolean = true,
                                declare: Boolean = false): DataFrame = {
    val cp0 = df.localCheckpoint(eager)
    // memoized on the origin's QueryExecution (the checkpoint just ran
    // it), and bounded because every upstream checkpoint leaf is clamped
    val originSize = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val cp = org.apache.spark.sql.execution.GraftStatsBarrier
      .rebuildWithBoundedStats(cp0, originSize,
        if (declare) Some(df) else None)
    backingRdd(cp).foreach { r =>
      val ref = new WeakReference[RDD[_]](r)
      live.synchronized {
        live.filterInPlace(_.get != null) // drop GC'd entries as we go
        live += ref
      }
      Option(scope.get()).foreach(_ += ref)
    }
    cp
  }

  /** Runs `body` and afterwards — success or failure — frees every
    * checkpoint the CURRENT THREAD created inside it. The safe cleanup
    * for a composed pipeline (e.g. [[graft.PipelineCli.run]]): internal
    * checkpoints are consumed by the time the body's results are
    * materialized, and unlike [[releaseAll]] it cannot touch checkpoints
    * that a concurrent query on another thread created. Nest freely;
    * inner scopes release first. Do NOT return un-materialized frames
    * built on checkpoints out of the scope — their backing blocks are
    * gone. */
  def scoped[A](body: => A): A = {
    val outer = scope.get()
    val mine = scala.collection.mutable.ListBuffer.empty[WeakReference[RDD[_]]]
    scope.set(mine)
    try body
    finally {
      scope.set(outer)
      mine.foreach { ref =>
        val r = ref.get
        if (r != null && r.getStorageLevel != StorageLevel.NONE)
          r.unpersist(blocking = false)
      }
    }
  }

  /** The checkpointed RDD a `localCheckpoint` result wraps (its analyzed
    * plan is a LogicalRDD leaf). None for non-checkpoint frames. */
  private def backingRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }

  /** Free the blocks behind one checkpointed frame (graft's or any
    * `localCheckpoint` result). Returns false (no-op) for frames that are
    * not checkpoints or were already released. */
  def release(df: DataFrame): Boolean = backingRdd(df) match {
    case Some(r) if r.getStorageLevel != StorageLevel.NONE =>
      r.unpersist(blocking = false); true
    case _ => false
  }

  /** Free every live graft-created checkpoint in this JVM; returns how
    * many held blocks. Call between pipeline stages / bench queries once
    * prior results are consumed. */
  def releaseAll(): Int = live.synchronized {
    var n = 0
    live.foreach { ref =>
      val r = ref.get
      if (r != null && r.getStorageLevel != StorageLevel.NONE) {
        r.unpersist(blocking = false); n += 1
      }
    }
    live.clear()
    n
  }

  /** The session's shuffle-partition count — the explicit N the iterative
    * operators pass to `repartition(N, key)` so the exchange is never
    * AQE-coalesced and the checkpoint barrier can declare the concrete
    * hash partitioning for per-round exchange elision (guide §2.4). */
  private[graft] def shuffleParts(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** The actual bytes a MATERIALIZED (eager) checkpoint holds in the
    * block manager — ground truth, not an estimate. None for lazy /
    * released / non-checkpoint frames. */
  private[graft] def materializedBytes(df: DataFrame): Option[Long] =
    backingRdd(df).flatMap { r =>
      df.sparkSession.sparkContext.getRDDStorageInfo.find(_.id == r.id)
        .map(i => i.memSize + i.diskSize).filter(_ > 0)
    }

  /** Scale-adaptive partition count for an iterative loop's pinned
    * partitioning: `bytes` (ideally [[materializedBytes]] of the loop's
    * largest reused checkpoint) divided by the session's AQE advisory
    * partition size, clamped to [1, shuffle partitions]. This is AQE's
    * own coalescing rule applied to the one exchange AQE must NOT touch
    * (a coalesced exchange loses its hash property, so the per-round
    * joins would re-shuffle — the UnknownPartitioning regression the
    * round-plan probe measured); deriving from data size keeps the loop
    * a handful of tasks at bench scale and conf-bounded at 100 TB,
    * never a constant tuned to either (guide §2.2). */
  private[graft] def sizedParts(spark: org.apache.spark.sql.SparkSession,
                                bytes: Long): Int = {
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"))
    val want = math.ceil(bytes.toDouble / math.max(1L, advisory)).toInt
    math.max(1, math.min(shuffleParts(spark), want))
  }

  /** The planner's own size estimate for a frame (post-barrier bounded
    * stats for checkpoints) — the number the join strategy will be
    * decided from. */
  private[graft] def planStats(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** True when a frame with planner estimate `estimate` falls under the
    * session's `autoBroadcastJoinThreshold` — i.e. the planner would
    * broadcast it and a per-round join against it needs NO exchange
    * anyway. Iterative operators use this to pick their loop shape with
    * the planner's OWN rule: below the threshold they keep the
    * broadcast-friendly shape (fastest at bench scale); above it they
    * pin explicit co-partitioning + merge joins so no round ever
    * broadcasts or re-exchanges the big tables (the only shape that
    * works at 100 TB). Threshold -1 (broadcast disabled) always selects
    * the pinned shape. */
  private[graft] def broadcastRegime(spark: org.apache.spark.sql.SparkSession,
                                     estimate: BigInt): Boolean = {
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val thresh =
      try raw.trim.toLong
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      }
    thresh > 0 && estimate <= BigInt(thresh)
  }

  /** Checkpoints still holding blocks (not yet released or GC'd). */
  def liveCount: Int = live.synchronized {
    live.count { ref =>
      val r = ref.get; r != null && r.getStorageLevel != StorageLevel.NONE
    }
  }
}

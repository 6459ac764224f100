package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regression gate over EVERY registered query: the scale
  * anti-patterns this library's design bans — a partitionless window
  * (single-task sort of the whole input), a cartesian product, or a
  * whole-corpus nested-loop join — must not appear in any gate query's
  * physical plan. This turns the bench-tail eyeball check ("zero
  * `WindowExec: No Partition Defined` warnings") into a spec, so a future
  * q-entry that sneaks in `Window.orderBy` without `partitionBy`, or a
  * join that degrades to BNLJ, fails here rather than at 100 TB.
  *
  * The audit inspects two surfaces:
  *  1. each gate's `sparkPlan` (the physical plan before AQE), which
  *     exists without running the query;
  *  2. every plan EXECUTED during gate construction, captured via a
  *     `QueryExecutionListener` — operators that eagerly materialize
  *     sub-plans (`localCheckpoint` in bitmapSignatures / jaccardPairs'
  *     sets / clusters' rounds) truncate their lineage to an RDD scan,
  *     so surface 1 alone would never see an anti-pattern hidden there.
  * Remaining blind spot: raw RDD jobs (GlobalRank's zipWithIndex) carry
  * no SQL plan at all — they are custom exchanges by design.
  * Construction runs those jobs, which is why this uses sf0.001.
  */
class GatePlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // A gate may only appear here WITH a justification for its shape.
  private val allowNestedLoop: Set[String] = Set(
    // The exact brute-force top-k scan: a BROADCAST cross of the tiny
    // query set against the streamed corpus — O(n·|Q|) work on n rows,
    // embarrassingly parallel, never corpus×corpus. This is the
    // documented exact baseline; the 100 TB path is the LSH/IVF ANN
    // operators (bucket-keyed equi-joins, recall-spec-gated).
    "q22_topk_cosine",
    // The CMS estimate read: a broadcast product of two SMALL sides —
    // the O(groups) sketch table (fixed-width state, the raw rows long
    // since discarded) × the broadcast probe list. O(groups·probes)
    // work by construction; there is no corpus side for a nested loop
    // to blow up on. (An equi-keyed rewrite was tried and rejected: any
    // constant join key is constant-folded and the join re-planned as
    // this same BNLJ, so the exemption states the truth instead of
    // hiding it behind a synthetic key.)
    "q237_cms_estimate",
    // The KMV set-operation read: the q237 shape again — a broadcast
    // product of two O(types) sketch tables on the pair inequality
    // (key_a < key_b has no equi-key), fixed-width state, the raw rows
    // long since discarded. O(types²·m) work by construction.
    "q242_kmv_setops",
    // The contamination-triage read: the ONE-row global benchmark
    // sketch broadcast against the O(sources) sketch table — a 1×N
    // product of fixed-width state, the gram rows long since collapsed.
    "q244_contamination_est",
    // The AMS join-size read: two ONE-row global count-sketches meeting
    // in a broadcast product — fixed-width state, raw rows collapsed.
    "q247_ams_join_size",
    // The 3-way KMV read: the q242 shape chained once more — O(types³)
    // broadcast products of fixed-width sketch vectors.
    "q250_kmv_triples",
    // The JL shortlist: the q22 shape at 1/4 the bandwidth — a
    // broadcast cross of the tiny PROJECTED query set against the
    // streamed projected candidates (16 Longs per row, O(n·|Q|)); the
    // exact rerank that follows is equi-keyed on the shortlist.
    "q256_jl_rerank")
  private val allowGlobalWindow: Set[String] = Set.empty

  private def offenders(plan: SparkPlan): Seq[String] = {
    val bad = Seq.newBuilder[String]
    plan.foreach {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        bad += s"partitionless WindowExec(${w.windowExpression.map(_.sql).mkString(", ").take(60)})"
      case _: CartesianProductExec => bad += "CartesianProduct"
      case j: BroadcastNestedLoopJoinExec => bad += s"BroadcastNestedLoopJoin(${j.joinType})"
      case _ =>
    }
    bad.result()
  }

  test("no gate query plans a partitionless window, cartesian, or nested-loop join") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.execution.QueryExecution]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        captured.add(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val failures = Seq.newBuilder[String]
    try {
      for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val found = offenders(q(spark, sfDir).queryExecution.sparkPlan)
        val filtered = found.filterNot { f =>
          (f.startsWith("partitionless") && allowGlobalWindow(name)) ||
          // the exemption covers ONLY the broadcast nested loop it
          // justifies — a regression to a CartesianProduct must still fail
          (f.startsWith("BroadcastNestedLoopJoin") && allowNestedLoop(name))
        }
        if (filtered.nonEmpty) failures += s"$name: ${filtered.mkString("; ")}"
      }
      // listener events are async: wait for the bus to go quiet before
      // auditing the construction-time (checkpoint-materialized) plans
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        if (captured.size == last) stable += 1 else { stable = 0; last = captured.size }
      }
      captured.forEach { qe =>
        val planStr = qe.sparkPlan.toString
        val found = offenders(qe.sparkPlan).filterNot { f =>
          // the top-k operators now surface their scan via Dataset.rdd
          // (which fires a listener event at conversion), so q22/q30's
          // documented broadcast cross — tiny query set against the
          // streamed corpus — shows up here too. Exempt ONLY that exact
          // shape: the BNLJ form (a CartesianProduct regression still
          // fails) scoring with the QUERY-vector kernel naming
          // "dot_long(qv" — a corpus×corpus BNLJ (embedNearDup-style
          // kernels score dot_long(a.v, b.v)) would NOT match. The JL
          // shortlist (q256) is the same shape on the PROJECTED query
          // vectors — its kernel names "qjl", equally query-specific
          f.startsWith("BroadcastNestedLoopJoin") &&
            (planStr.contains("dot_long(qv") || planStr.contains("qjl"))
        }
        if (found.nonEmpty)
          failures += s"construction-time plan: ${found.mkString("; ")} in\n${planStr.take(800)}"
      }
      assert(captured.size > 0, "listener captured nothing — the construction-time audit went blind")
    } finally spark.listenerManager.unregister(listener)
    assert(failures.result().isEmpty,
      s"scale anti-patterns in gate plans:\n${failures.result().mkString("\n")}")
  }
}

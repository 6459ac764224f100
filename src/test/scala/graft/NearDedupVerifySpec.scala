package graft

import graft.text.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** The nearDedup verify stage's scale contract: whatever the broadcast
  * path broadcasts must be CANDIDATE-bounded, never the whole corpus's
  * word-set table. The set table is O(corpus tokens); LSH candidates are
  * ~dup mass. A verify that broadcasts the unpruned set table is correct
  * at test scale and an executor OOM at 100 TB — so the plan shape itself
  * is pinned here, alongside exact output parity between the broadcast
  * and shuffled verify paths (they must be interchangeable, differing
  * only in exchange strategy).
  */
class NearDedupVerifySpec extends SparkSpec {
  import spark.implicits._

  // ~200 docs, 10 planted near-dup pairs (one word appended), the rest
  // pairwise-distinct word sets — candidate ids are a small fraction of
  // the corpus, which is exactly the regime the pruning exists for.
  private def docs: DataFrame = {
    val base = (0 until 200).map { i =>
      val words = (0 until 12).map(j => s"w${(i * 31 + j * 7) % 997}_$i").mkString(" ")
      (i.toLong, words)
    }
    val dups = (0 until 10).map { k =>
      val (_, t) = base(k * 3)
      (1000L + k, t + " extra")
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  test("broadcast verify only broadcasts the candidate-pruned set table") {
    val vp = Dedup.verifiedPairs(docs, numHashes = 16, bands = 8,
      rowsPerBand = 2, num = 4, den = 5, broadcastVerify = true)
    val plan = vp.queryExecution.sparkPlan
    val innerBuilds = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType == Inner =>
        if (j.buildSide == BuildLeft) j.left else j.right
    }
    // the two verify joins broadcast the set table — recognizable by the
    // `set` word-set column in the build side's output (the construction
    // expression itself may be constant-folded into a LocalTableScan)
    val setBuilds = innerBuilds.filter(_.output.exists(_.name == "set"))
    assert(setBuilds.nonEmpty,
      s"expected verify joins broadcasting the set table; inner builds:\n" +
        innerBuilds.map(_.toString.take(300)).mkString("\n---\n"))
    setBuilds.foreach { b =>
      val semis = b.collect {
        case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
      }
      assert(semis.nonEmpty,
        "broadcast side carries the corpus set table WITHOUT candidate " +
          s"pruning (no LeftSemi in the build subtree):\n${b.toString.take(1200)}")
    }
  }

  test("broadcast and shuffled verify paths agree exactly") {
    def edges(bv: Boolean): Seq[(Long, Long)] =
      Dedup.verifiedPairs(docs, 16, 8, 2, 4, 5, broadcastVerify = bv)
        .as[(Long, Long)].collect().sorted.toSeq
    val b = edges(bv = true)
    val s = edges(bv = false)
    assert(b.nonEmpty, "planted near-dups should survive verification")
    assert(b == s, s"verify paths disagree: broadcast=$b shuffled=$s")

    def clustersOf(bv: Boolean): Seq[(Long, Long)] =
      Dedup.nearDedup(docs, broadcastVerify = bv)
        .as[(Long, Long)].collect().sorted.toSeq
    assert(clustersOf(bv = true) == clustersOf(bv = false),
      "end-to-end nearDedup output differs between verify paths")
  }
}

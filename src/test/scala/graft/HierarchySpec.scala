package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.graph.Hierarchy

/** Ancestor closure: tree flattening, DAG min-depth dedupe, cycle raise. */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], depth: Int,
                  rounds: Option[AtomicInteger] = None): Set[(Long, Long, Long)] =
    Hierarchy.ancestors(edges.toDF("c", "p"), "c", "p", depth, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("tree closure: every ancestor at its exact level") {
    // 4 → 3 → 2 → 1
    val chain = Seq((4L, 3L), (3L, 2L), (2L, 1L))
    assert(run(chain, 4) == Set(
      (4L, 3L, 1L), (4L, 2L, 2L), (4L, 1L, 3L),
      (3L, 2L, 1L), (3L, 1L, 2L), (2L, 1L, 1L)))
  }

  test("maxDepth truncates the closure honestly") {
    val chain = Seq((4L, 3L), (3L, 2L), (2L, 1L))
    assert(run(chain, 1) == Set((4L, 3L, 1L), (3L, 2L, 1L), (2L, 1L, 1L)))
    assert(run(chain, 2) == Set(
      (4L, 3L, 1L), (4L, 2L, 2L), (3L, 2L, 1L), (3L, 1L, 2L), (2L, 1L, 1L)))
  }

  test("DAG diamond dedupes to minimum depth") {
    // 1 → {2, 3} → 4, plus a direct shortcut 1 → 4: ancestor 4 of node 1
    // is reachable at depths 1 (shortcut) and 2 (both sides) — one row,
    // depth 1
    val dag = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
    val got = run(dag, 3)
    assert(got.count(t => t._1 == 1L && t._2 == 4L) == 1)
    assert(got.contains((1L, 4L, 1L)))
  }

  test("early stop once the frontier drains; rounds observed") {
    val rounds = new AtomicInteger(-1)
    run(Seq((4L, 3L), (3L, 2L), (2L, 1L)), 10, Some(rounds))
    // 3 productive levels + the empty-frontier proof round
    assert(rounds.get == 4, s"ran ${rounds.get}")
  }

  test("a cycle raises instead of looping silently") {
    val e = intercept[Exception] { run(Seq((1L, 2L), (2L, 1L)), 5) }
    assert(String.valueOf(e.getMessage).contains("cycle") ||
      e.getCause != null)
  }

  test("null parents terminate chains; parameters validated") {
    val got = Hierarchy.ancestors(
        Seq((2L, Some(1L)), (1L, Option.empty[Long])).toDF("c", "p"),
        "c", "p", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      Hierarchy.ancestors(Seq((1L, 2L)).toDF("c", "p"), "c", "p", 0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.text.Dedup

/** Incremental connected components ([[Dedup.ccDelta]]): the
  * incremental == one-shot consistency contract, new-node entry, empty
  * deltas, and the loud validity guards — the clustering family's
  * warm-start sibling of DedupDeltaSpec. */
class CcDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    Dedup.clustersStars(nodes.toDF("doc_id"), edges.toDF("doc_a", "doc_b"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental == one-shot on random graphs (merge, extend, new nodes)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val n = 60 + trial * 10
      val nodes = (0L until n.toLong).toSeq
      val oldEdges = Seq.fill(n / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      // delta touches old nodes, bridges components, and brings fresh
      // ids the corpus has never seen
      val delta = Seq.fill(n / 3)(
        (rnd.nextInt(n + 20).toLong, rnd.nextInt(n + 20).toLong))
        .filter(e => e._1 != e._2)
      val allNodes = (nodes ++ delta.flatMap(e => Seq(e._1, e._2))).distinct
      val cold = cc(nodes, oldEdges)
      val got = asMap(Dedup.ccDelta(cold, delta.toDF("doc_a", "doc_b")))
      val want = asMap(cc(allNodes, oldEdges ++ delta))
      assert(got == want, s"trial $trial")
    }
  }

  test("empty delta returns the stored labels unchanged; delta of only-new nodes") {
    val cold = cc(Seq(1L, 2L, 3L), Seq((1L, 2L)))
    val same = asMap(Dedup.ccDelta(cold,
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")))
    assert(same == asMap(cold))
    // a delta entirely among unseen ids: old labels untouched, new
    // component labeled by its min
    val got = asMap(Dedup.ccDelta(cold, Seq((100L, 101L)).toDF("doc_a", "doc_b")))
    assert(got == asMap(cold) ++ Map(100L -> 100L, 101L -> 100L))
  }

  test("chained deltas == one big delta (the stored-artifact maintenance loop)") {
    val nodes = (0L to 30L).toSeq
    val e0 = Seq((0L, 5L), (10L, 15L), (20L, 25L))
    val d1 = Seq((5L, 10L), (26L, 27L))
    val d2 = Seq((15L, 20L), (40L, 41L), (41L, 0L))
    val afterD1 = Dedup.ccDelta(cc(nodes, e0), d1.toDF("doc_a", "doc_b"))
    val chained = asMap(Dedup.ccDelta(afterD1, d2.toDF("doc_a", "doc_b")))
    val oneShot = asMap(cc(nodes ++ Seq(40L, 41L), e0 ++ d1 ++ d2))
    assert(chained == oneShot)
  }

  test("duplicate doc_id RAISES; label above node RAISES") {
    val dup = Seq((1L, 1L), (1L, 1L), (2L, 2L)).toDF("doc_id", "cluster")
    val e1 = intercept[Exception] {
      Dedup.ccDelta(dup, Seq((1L, 2L)).toDF("doc_a", "doc_b")).collect()
    }
    assert(e1.getMessage.contains("must be unique"))
    val bad = Seq((1L, 5L), (5L, 5L)).toDF("doc_id", "cluster")
    val e2 = intercept[Exception] {
      Dedup.ccDelta(bad, Seq((1L, 5L)).toDF("doc_a", "doc_b")).collect()
    }
    assert(e2.getMessage.contains("component MIN"))
  }
}

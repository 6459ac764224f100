package graft

import org.apache.spark.sql.functions._

import graft.text.Pipeline

/** Deterministic training-order shuffle (q73): a reproducible,
  * partitioning-invariant permutation keyed by salted hash. */
class TrainingOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("ranks are a 0-based permutation consistent with the salted hash order") {
    val out = Pipeline.trainingOrder(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.map(_._1).sorted.toSeq == (0L until 500L))
    // recompute the expected order from the same hash expression
    val expected = docs
      .select(col("doc_id"), graft.operators.Sampling.keyHash(Seq("doc_id"), "order").as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2).toSeq
    assert(out.sortBy(_._1).map(_._2).toSeq == expected)
  }

  test("order is partition-count invariant and differs from doc_id order") {
    val a = Pipeline.trainingOrder(docs).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Pipeline.trainingOrder(docs.repartition(13)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b), "rank assignment changed with partitioning")
    // a hash permutation of 500 docs that preserves doc_id order would be
    // astronomically unlucky — this guards against rank≡doc_id bugs
    assert(a.map(_._2).toSeq != a.map(_._1).map(_ + 1).toSeq)
  }

  test("different salts draw independent epoch orders") {
    val e0 = Pipeline.trainingOrder(docs, salt = "epoch0").collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    val e1 = Pipeline.trainingOrder(docs, salt = "epoch1").collect()
      .sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(e0 != e1)
    assert(e0.sorted == e1.sorted) // same docs, different order
  }

  private val srcDocs = (1L to 700L)
    .map(i => (i, s"s${i % 7 match { case 0 | 1 | 2 => 0; case 3 | 4 => 1; case n => n }}"))
    .toDF("doc_id", "source")

  test("interleave: positions are a permutation and every prefix is source-proportional ±1") {
    val out = Pipeline.interleaveBySource(srcDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 700L))
    val ns = out.groupBy(_._3).view.mapValues(_.size).toMap
    val n = out.length
    // low-discrepancy guarantee: |count_s(prefix L) − L·n_s/n| stays O(1)
    // for EVERY prefix — a hash shuffle drifts by O(√L)
    val seen = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    out.foreach { case (pos, _, src) =>
      seen(src) += 1
      val l = pos + 1
      for ((s, c) <- seen)
        assert(math.abs(c - l.toDouble * ns(s) / n) <= 1.5 + 1e-9,
          s"prefix $l: source $s count $c vs expected ${l.toDouble * ns(s) / n}")
    }
  }

  test("interleave is deterministic across partitionings") {
    val a = Pipeline.interleaveBySource(srcDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Pipeline.interleaveBySource(srcDocs.repartition(11)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("interleave: NULL sources form one group and break fraction ties NULL-LAST") {
    // two equal-sized sources — one real, one NULL — share the fraction
    // grid (2r+1)/20 exactly, so every position pair (2i, 2i+1) is a tie:
    // the real source must take the even slot (ANSI ORDER BY source puts
    // NULLs last; the oracle's row_number does the same)
    val docs = ((1L to 10L).map(i => (i, "a")) ++ (11L to 20L).map(i => (i, null: String)))
      .toDF("doc_id", "source")
    val out = Pipeline.interleaveBySource(docs).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getString(2))))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 20L))
    out.grouped(2).zipWithIndex.foreach { case (pair, i) =>
      assert(pair(0)._2 == Some("a"), s"tie $i: real source not first")
      assert(pair(1)._2 == None, s"tie $i: NULL source not last")
    }
  }

  test("interleave: a real source named like the NULL group key does not collide") {
    // real names are prefixed in the grouping key, so a source literally
    // named "n" stays a separate group from the NULLs: equal sizes again
    // force tie pairs, real "n" first
    val docs = ((1L to 8L).map(i => (i, "n")) ++ (9L to 16L).map(i => (i, null: String)))
      .toDF("doc_id", "source")
    val out = Pipeline.interleaveBySource(docs).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getString(2))))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 16L))
    out.grouped(2).foreach { pair =>
      assert(pair(0)._2 == Some("n") && pair(1)._2 == None,
        "sentinel collision: 'n'-named source merged with the NULL group")
    }
  }
}

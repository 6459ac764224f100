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
}

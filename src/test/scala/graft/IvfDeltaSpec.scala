package graft

import org.apache.spark.sql.functions._

import graft.embed.{Pq, Similarity}

/** Incremental ANN index maintenance (r15): folding a new vector batch
  * into a STORED IVF inverted file / STORED PQ code table must equal the
  * one-shot index built on the same model (so search recall over the
  * updated index is the from-scratch index's, unchanged by when a vector
  * arrived), ids must be disjoint (loud RAISE), and the stored rows must
  * pass through untouched. The exact replay is oracle-gated (q238/q239).
  */
class IvfDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Seq[Long], dim: Int = 16): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    ids.map { id =>
      id -> Seq.fill(dim)((rnd.nextFloat() - 0.5f) * 1.5f)
    }
  }

  test("ivfAssignDelta: fold-in == one-shot on the same model; corpus rows untouched") {
    val all = vecs(1L to 120L)
    val corpus = all.filter(_._1 % 3 != 0).toDF("vec_id", "embedding")
    val delta = all.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    val whole = all.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, nCells = 6)
    val stored = Similarity.ivfAssign(corpus, cents)
    val folded = Similarity.ivfAssignDelta(cents, stored, delta)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val oneShot = Similarity.ivfAssign(whole, cents)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(folded == oneShot, "delta fold diverged from the one-shot index")
    // stored rows pass through bit-identical (never re-scored)
    val storedRows = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedRows.subsetOf(folded.toSet))
  }

  test("ivfAssignDelta guards: overlapping ids and duplicate model cells RAISE; NULL delta embeddings drop") {
    val corpus = vecs(1L to 30L).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, nCells = 4)
    val stored = Similarity.ivfAssign(corpus, cents)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.ivfAssignDelta(cents, stored,
        vecs(Seq(5L, 200L)).toDF("vec_id", "embedding"))
    }
    assert(e1.getMessage.contains("disjoint"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfAssignDelta(cents.union(cents), stored,
        vecs(Seq(200L)).toDF("vec_id", "embedding"))
    }
    assert(e2.getMessage.contains("duplicate cell"))
    val withNull = vecs(Seq(200L)).toDF("vec_id", "embedding")
      .union(Seq((201L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val out = Similarity.ivfAssignDelta(cents, stored, withNull)
      .filter(col("vec_id") >= 200L).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(200L), "NULL embedding must drop, not assign")
  }

  test("ivfAssignDelta plans narrowly: no join, no exchange beyond the stored file's own lineage") {
    val corpus = vecs(1L to 30L).toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(corpus, nCells = 4)
    val stored = Similarity.ivfAssign(corpus, cents)
      .localCheckpoint(true) // the stored artifact: a scan, no lineage
    val plan = Similarity.ivfAssignDelta(cents, stored,
        vecs(Seq(200L, 201L)).toDF("vec_id", "embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"delta assignment must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"delta assignment must not shuffle:\n$plan")
  }

  test("encodeDelta: fold-in == one-shot on the same codebooks; overlap RAISES") {
    val all = vecs(1L to 90L)
    val corpus = all.filter(_._1 % 3 != 0).toDF("vec_id", "embedding")
    val delta = all.filter(_._1 % 3 == 0).toDF("vec_id", "embedding")
    val whole = all.toDF("vec_id", "embedding")
    val cb = Pq.seedCodebooks(corpus.orderBy("vec_id").limit(8), m = 4)
    val stored = Pq.encode(corpus, cb)
    val folded = Pq.encodeDelta(cb, stored, delta)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val oneShot = Pq.encode(whole, cb)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(folded == oneShot, "delta encode diverged from the one-shot code table")
    val e = intercept[IllegalArgumentException] {
      Pq.encodeDelta(cb, stored, vecs(Seq(2L)).toDF("vec_id", "embedding"))
    }
    assert(e.getMessage.contains("disjoint"))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-vectors: v(seed) with a planted near-duplicate
    * structure — vectors with the same group share direction plus small
    * per-id noise; groups are near-orthogonal. */
  private def vec(group: Int, noiseSeed: Int, dim: Int = 16): Seq[Float] =
    (0 until dim).map { d =>
      val basis = if (d % 4 == group % 4) 1.0f else 0.0f
      val noise = (((noiseSeed * 2654435761L + d * 40503L) % 1000) - 500) / 50000.0f
      basis + noise
    }

  private def table(n: Int): DataFrame =
    (0 until n).map(i => (i.toLong, vec(i % 4, i), i % 4)).toDF("vec_id", "embedding", "label")

  test("topkCosine ranks same-group vectors first") {
    val t = table(40)
    val out = Similarity.topkCosine(t.filter($"vec_id" < 4), t.filter($"vec_id" >= 4), k = 5)
    val rows = out.collect()
    assert(rows.length == 4 * 5)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id"); val c = r.getAs[Long]("cand_id")
      assert(q % 4 == c % 4, s"query $q got cross-group neighbor $c")
    }
    // deterministic across runs
    assert(out.collect().sameElements(rows))
  }

  test("closestPairsBlocked returns the k best same-label pairs, ordered") {
    val t = table(24)
    val rows = Similarity.closestPairsBlocked(t, "label", k = 10).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score"))
    assert(scores.sameElements(scores.sortBy(-_)), "not sorted by score desc")
    rows.foreach(r => assert(r.getAs[Long]("vid_a") % 4 == r.getAs[Long]("vid_b") % 4))
  }

  test("annTopkCosine: high recall vs exact top-k on clustered vectors") {
    val t = table(120)
    val q = t.filter($"vec_id" < 4)
    val c = t.filter($"vec_id" >= 4)
    val exact = Similarity.topkCosine(q, c, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val ann = Similarity.annTopkCosine(q, c, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact ann=$ann")
  }

  test("cosinePairsBlocked keeps exactly the same-label pairs above the threshold") {
    val t = table(16) // label == group: every same-label pair is a near-dup
    val rows = Similarity.cosinePairsBlocked(t, "label", minScore1e6 = 900000L).collect()
    val expect = (for { a <- 0 until 16; b <- 0 until 16
                        if a < b && a % 4 == b % 4 } yield (a.toLong, b.toLong)).toSet
    val got = rows.map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b"))).toSet
    assert(got == expect, s"got=$got expect=$expect")
    rows.foreach(r => assert(r.getAs[Long]("score") >= 900000L))
    // sorted on (vid_a, vid_b) — the oracle-gate contract
    val keys = rows.map(r => (r.getAs[Long]("vid_a"), r.getAs[Long]("vid_b")))
    assert(keys.sameElements(keys.sorted))
  }

  test("embedNearDup clusters planted near-dup groups, keeps groups apart") {
    val t = table(40)
    val out = Similarity.embedNearDup(t, minScore1e6 = 900000L).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"))).toMap
    assert(out.size == 40)
    // groups are near-orthogonal: every vector must land on its group's
    // min id (0..3) and never on another group's
    out.foreach { case (vid, cl) =>
      assert(cl == vid % 4, s"vec $vid clustered to $cl, expected ${vid % 4}")
    }
  }

  test("ivfTopkCosine: high recall vs exact top-k on clustered vectors") {
    val t = table(120)
    val q = t.filter($"vec_id" < 4)
    val c = t.filter($"vec_id" >= 4)
    val exact = Similarity.topkCosine(q, c, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopkCosine(q, c, k = 5, nCells = 8, nProbe = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact ivf=$ivf")
    // deterministic index: same centroids, same result, run to run
    val again = Similarity.ivfTopkCosine(q, c, k = 5, nCells = 8, nProbe = 3).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    assert(again == ivf)
  }

  test("ivfCentroids seedOrder hook: md5-ordered sample replays exactly (q89's oracle convention)") {
    // same convention as Pq's q88 spec: seeds = first nCells by
    // (md5hex(id's decimal spelling), id), cell ids by vec_id order
    // among the selected — pinned so the q89 DuckDB cseed CTE and this
    // code can't silently drift apart
    val t = table(40)
    val ids = t.select("vec_id").collect().map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantIds = ids.sortBy(id => (md5hex(id.toString), id)).take(6).sorted
    val byId = t.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)).toMap
    val got = Similarity.ivfCentroids(t, nCells = 6,
        seedOrder = md5(col("vec_id").cast("string").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = wantIds.zipWithIndex.map { case (id, i) =>
      i.toLong -> byId(id).toSeq }.toMap
    assert(got == want)
  }

  test("ivfRefine: one Lloyd round lifts recall to >= 0.9 at unchanged nProbe, deterministically") {
    val t = table(120)
    val q = t.filter($"vec_id" < 4)
    val c = t.filter($"vec_id" >= 4)
    val exact = Similarity.topkCosine(q, c, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    def run() = Similarity.ivfTopkCosine(q, c, k = 5, nCells = 8, nProbe = 3,
      refineIters = 1).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"))).toSet
    val refined = run()
    val recall = (exact intersect refined).size.toDouble / exact.size
    assert(recall >= 0.9, s"refined recall=$recall exact=$exact ivf=$refined")
    assert(run() == refined) // refinement is deterministic run to run
    // an empty cell keeps its centroid: refine never shrinks the index
    val cents = Similarity.ivfCentroids(c, 8)
    assert(Similarity.ivfRefine(c, cents, iters = 2).count() == 8)
    // iters = 0 is the identity
    assert(Similarity.ivfRefine(c, cents, iters = 0).collect().toSeq ==
      cents.collect().toSeq)
  }

  test("zero-norm vectors degrade per row (no ANSI divide crash), never rank") {
    // components in [0, 0.001) quantize to the all-zero vector: qn = 0
    val zero = Seq.fill(16)(0.0004f)
    val t = table(12)
    val withZero = t.union(Seq((99L, zero, 0)).toDF("vec_id", "embedding", "label"))
    val out = Similarity.topkCosine(t.filter($"vec_id" < 4),
      withZero.filter($"vec_id" >= 4), k = 5).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Long]("cand_id") != 99L),
      "zero-norm candidate must drop out, not crash or rank")
    // threshold path: the zero vector pairs with nothing
    val pairs = Similarity.cosinePairsBlocked(withZero, "label", 100000L).collect()
    assert(pairs.forall(r => r.getAs[Long]("vid_a") != 99L && r.getAs[Long]("vid_b") != 99L))
    // assignment still lands somewhere deterministic
    val cells = Similarity.ivfAssign(withZero, Similarity.ivfCentroids(t, 4))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(cells.contains(99L))
  }

  test("hyperplane signatures: same-group pairs at smaller hamming distance") {
    val t = table(64)
    val buckets = Similarity.hyperplaneBuckets(t, nPlanes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = buckets.keys.toSeq.sorted
    val (same, cross) = (for { a <- ids; b <- ids if a < b }
      yield (a % 4 == b % 4, ham(buckets(a), buckets(b)))).partition(_._1)
    val sameAvg = same.map(_._2).sum.toDouble / same.size
    val crossAvg = cross.map(_._2).sum.toDouble / cross.size
    // the LSH property: cosine-similar vectors agree on most hyperplane signs
    assert(sameAvg < crossAvg / 2, s"sameAvg=$sameAvg crossAvg=$crossAvg")
    // determinism (no RNG state anywhere)
    val again = Similarity.hyperplaneBuckets(t, nPlanes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == buckets)
  }

  test("topkCosine degrades NULL candidate ids like NULL scores") {
    val t = table(12)
    val q = t.filter($"vec_id" < 4)
    val withNull = t.filter($"vec_id" >= 4)
      .withColumn("vec_id", when($"vec_id" === 7L, lit(null)).otherwise($"vec_id"))
    val out = Similarity.topkCosine(q, withNull, k = 20).collect()
    assert(out.nonEmpty)
    assert(!out.exists(r => r.isNullAt(r.fieldIndex("cand_id"))), "NULL id row leaked")
    assert(!out.exists(_.getAs[Long]("cand_id") == 7L))
  }
}

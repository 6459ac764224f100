package graft

import org.apache.spark.sql.functions._

import graft.embed.Pq

/** Product quantization (q84): codebook construction, encode-vs-brute-force
  * parity, ADC score exactness against the reconstruction identity, Lloyd
  * determinism, and the point of the exercise — ADC neighbor structure
  * tracks the exact ranking. All arithmetic is on the integer grid
  * (floor(x·1000)), so every expectation is computed exactly in Scala. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Float): Long = math.floor(x.toDouble * 1000).toLong

  private def vecsDF(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(i => i -> Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  // exact squared L2 between two quantized subvectors
  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("seedCodebooks: entry (sub, code) is seed-rank-code's sub-th subvector, cn = |cv|^2") {
    val seeds = Seq(5L -> Seq(0.1f, 0.2f, 0.3f, 0.4f),
                    3L -> Seq(-0.5f, 0.6f, -0.7f, 0.8f))
    val cb = Pq.seedCodebooks(vecsDF(seeds: _*), m = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getSeq[Long](2), r.getLong(3))).toMap
    assert(cb.size == 4)
    // rank order is by vec_id: code 0 = vec 3, code 1 = vec 5
    val v3 = seeds(1)._2.map(q); val v5 = seeds(0)._2.map(q)
    assert(cb((0, 0L))._1 == v3.slice(0, 2) && cb((1, 0L))._1 == v3.slice(2, 4))
    assert(cb((0, 1L))._1 == v5.slice(0, 2) && cb((1, 1L))._1 == v5.slice(2, 4))
    for (((_, _), (cv, cn)) <- cb) assert(cn == d2(cv, cv.map(_ => 0L)))
  }

  test("encode matches brute-force argmin with smallest-code tie-break") {
    val m = 4; val dim = 16
    val data = randVecs(40, dim, seed = 84)
    val cb = Pq.seedCodebooks(vecsDF(data.take(8): _*), m = m)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val got = Pq.encode(vecsDF(data: _*), cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.size == data.size)
    val d2sub = dim / m
    for ((id, v) <- data) {
      val qv = v.map(q)
      val want = (0 until m).map { sub =>
        val sv = qv.slice(sub * d2sub, sub * d2sub + d2sub)
        (0L until 8L).minBy(c => (d2(sv, cbMap((sub, c))), c))
      }
      assert(got(id) == want, s"vec $id: ${got(id)} vs $want")
    }
  }

  test("encode ties break toward the smallest code") {
    // two identical seeds -> every (sub, code) pair duplicated; the
    // assignment must pick code 0 everywhere
    val v = Seq(0.3f, -0.4f, 0.5f, -0.6f)
    val cb = Pq.seedCodebooks(vecsDF(1L -> v, 2L -> v), m = 2)
    val codes = Pq.encode(vecsDF(9L -> Seq(0.31f, -0.41f, 0.51f, -0.61f)), cb)
      .collect().head.getSeq[Long](1)
    assert(codes == Seq(0L, 0L))
  }

  test("topkAdc: adist is the EXACT squared L2 to the candidate's reconstruction") {
    val m = 4; val dim = 16; val k = 5
    val data = randVecs(50, dim, seed = 841)
    val queries = data.take(3)
    val cands = data.drop(3)
    val cb = Pq.seedCodebooks(vecsDF(cands.take(12): _*), m = m)
    val cbMap = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val codes = Pq.encode(vecsDF(cands: _*), cb)
    val codesMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = Pq.topkAdc(vecsDF(queries: _*), codes, cb, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val d2sub = dim / m
    // reconstruction distance per (query, candidate), exactly
    def adist(qv: Seq[Long], candId: Long): Long =
      (0 until m).map { sub =>
        val sv = qv.slice(sub * d2sub, sub * d2sub + d2sub)
        d2(sv, cbMap((sub, codesMap(candId)(sub))))
      }.sum
    val want = queries.flatMap { case (qid, v) =>
      val qv = v.map(q)
      cands.map { case (cid, _) => (qid, cid, adist(qv, cid)) }
        .sortBy { case (_, cid, d) => (d, cid) }
        .take(k).zipWithIndex
        .map { case ((qid2, cid, d), i) => (qid2, i + 1L, cid, d) }
    }
    assert(got.sortBy(r => (r._1, r._2)).toSeq == want.sortBy(r => (r._1, r._2)))
  }

  test("learned codebooks: iters=0 is the hash-ordered seed sample; k codes per subspace") {
    val data = randVecs(30, 8, seed = 842)
    val cb = Pq.codebooks(vecsDF(data: _*), m = 2, k = 4, iters = 0)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Long](2)))
    assert(cb.length == 8 && cb.map(_._1).distinct.length == 8)
    // seed identity: hash-order the ids exactly as the operator does
    val seedIds = vecsDF(data: _*).select(col("vec_id"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(4)
      .as[Long].collect().toSeq.sorted
    val byId = data.toMap
    val cbMap = cb.toMap
    for ((id, code) <- seedIds.zipWithIndex; sub <- 0 until 2) {
      val qv = byId(id).map(q)
      assert(cbMap((sub, code.toLong)) == qv.slice(sub * 4, sub * 4 + 4),
        s"seed $id code $code sub $sub")
    }
  }

  test("one Lloyd round: exact integer means; starved cells keep their previous entry") {
    val m = 1
    // only TWO distinct vectors among five, k=3: any seed sample holds a
    // duplicate pair, ties assign to the smaller code -> a cell starves
    val a = Seq(0.0f, 0.0f); val b = Seq(1.0f, 1.0f)
    val data = Seq(1L -> a, 2L -> a, 3L -> a, 4L -> b, 5L -> b)
    val cb0 = Pq.codebooks(vecsDF(data: _*), m = m, k = 3, iters = 0)
      .collect().map(r => r.getLong(1) -> r.getSeq[Long](2)).toMap
    val cb1 = Pq.codebooks(vecsDF(data: _*), m = m, k = 3, iters = 1)
      .collect().map(r => r.getLong(1) -> r.getSeq[Long](2)).toMap
    assert(cb1.keySet == Set(0L, 1L, 2L))
    // replay assignment + integer means in Scala
    val assign = data.map { case (id, v) =>
      val qv = v.map(q)
      id -> (0L until 3L).minBy(c => (d2(qv, cb0(c)), c))
    }
    val want = (0L until 3L).map { c =>
      val members = assign.collect { case (id, `c`) => data.toMap.apply(id).map(q) }
      // Spark's `s DIV c` truncates toward zero (NOT floorDiv) — Scala
      // Long division matches; floorDiv would diverge on negative sums
      c -> (if (members.isEmpty) cb0(c)
            else members.transpose.map(xs => xs.sum / xs.size).toSeq)
    }.toMap
    assert(want.values.exists(_ != null)) // shape guard
    assert((0L until 3L).forall(c => cb1(c) == want(c)),
      s"got $cb1 want $want (cb0 $cb0, assign $assign)")
    // at least one cell must actually be starved for the retention claim
    assert(assign.map(_._2).distinct.size < 3)
  }

  test("codebooks + encode + topkAdc are deterministic across runs") {
    val data = randVecs(60, 8, seed = 843)
    def run(): Seq[(Long, Long, Long, Long)] = {
      val cb = Pq.codebooks(vecsDF(data: _*), m = 2, k = 4, iters = 2)
      val codes = Pq.encode(vecsDF(data: _*), cb)
      Pq.topkAdc(vecsDF(data.take(2): _*), codes, cb, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(run() == run())
  }

  test("NULL embeddings are dropped from encode, not crashed on") {
    val withNull = vecsDF(1L -> Seq(0.1f, 0.2f), 2L -> null)
    val cb = Pq.seedCodebooks(vecsDF(1L -> Seq(0.1f, 0.2f)), m = 1)
    val out = Pq.encode(withNull, cb).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("ADC neighbor structure preserves clusters (ADC top-1 in the exact top-1's cluster >= 18/20)") {
    // PQ is LOSSY by design: candidates sharing a code tuple tie on adist,
    // so exact top-1 identity is not the contract — cluster preservation is.
    val rnd = new scala.util.Random(8400)
    val centers = Vector.fill(6)(Array.fill(16)(rnd.nextGaussian() * 0.3))
    val cluster = scala.collection.mutable.Map[Long, Int]()
    val data = (1L to 150L).map { i =>
      val ci = rnd.nextInt(centers.size); cluster(i) = ci
      i -> centers(ci).map(x => (x + 0.02 * rnd.nextGaussian()).toFloat).toSeq
    }
    val queries = data.take(20)
    val cands = data.drop(20)
    val cb = Pq.codebooks(vecsDF(cands: _*), m = 4, k = 8, iters = 2)
    val codes = Pq.encode(vecsDF(cands: _*), cb)
    val adcTop1 = Pq.topkAdc(vecsDF(queries: _*), codes, cb, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var hits = 0
    for ((qid, v) <- queries) {
      val qv = v.map(q)
      val exact = cands.minBy { case (cid, cv) => (d2(qv, cv.map(q)), cid) }._1
      if (cluster(adcTop1(qid)) == cluster(exact)) hits += 1
    }
    assert(hits >= 18, s"ADC cluster-preserving top-1: $hits/20")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.embed.{Pq, Similarity}

/** IVFADC (q84's composed form): exact brute-force replay of the whole
  * coarse-assign → residual-encode → probe → ADC chain, pruning honesty,
  * determinism, and cluster-preserving recall under real pruning. */
class IvfAdcSpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Float): Long = math.floor(x.toDouble * 1000).toLong

  private def vecsDF(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  private def qvDF(rows: (Long, Seq[Long])*) =
    rows.toDF("vec_id", "qv")

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def clustered(n: Int, dim: Int, nClusters: Int, seed: Int,
                        spread: Double = 0.02)
      : (Seq[(Long, Seq[Float])], Map[Long, Int]) = {
    val rnd = new scala.util.Random(seed)
    val centers = Vector.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 0.3))
    val cluster = scala.collection.mutable.Map[Long, Int]()
    val data = (1L to n.toLong).map { i =>
      val ci = rnd.nextInt(nClusters); cluster(i) = ci
      i -> centers(ci).map(x => (x + spread * rnd.nextGaussian()).toFloat).toSeq
    }
    (data, cluster.toMap)
  }

  // Scala replay of the operator's own deterministic sub-steps, driven by
  // the SAME collected model state (cents, pcb) the operator broadcasts.
  private def replay(data: Seq[(Long, Seq[Float])], queries: Seq[(Long, Seq[Float])],
                     cents: Map[Long, Seq[Long]], pcb: Map[(Int, Long), Seq[Long]],
                     m: Int, nProbe: Int)
      : (Map[Long, Long], Map[Long, Seq[Long]], Map[Long, Seq[Long]],
         Seq[(Long, Long, Long)]) = {
    val cells = cents.keys.toSeq.sorted
    val codesOf = pcb.keys.map(_._2).toSeq.distinct.sorted
    def nearestCell(qv: Seq[Long]): Long =
      cells.minBy(c => (d2(qv, cents(c)), c))
    val dim = data.head._2.size
    val dsub = dim / m
    // candidate side: assign, residual, encode
    val assignC = data.map { case (id, v) => id -> nearestCell(v.map(q)) }.toMap
    val residC = data.map { case (id, v) =>
      id -> v.map(q).zip(cents(assignC(id))).map { case (a, b) => a - b }
    }.toMap
    val codesC = data.map { case (id, _) =>
      id -> (0 until m).map { sub =>
        val sv = residC(id).slice(sub * dsub, sub * dsub + dsub)
        codesOf.minBy(c => (d2(sv, pcb((sub, c))), c))
      }.toSeq
    }.toMap
    // query side: probes, residuals, adist over probed candidates
    val scored = queries.flatMap { case (qid, v) =>
      val qv = v.map(q)
      val probed = cells.sortBy(c => (d2(qv, cents(c)), c)).take(nProbe)
      probed.flatMap { cell =>
        val rq = qv.zip(cents(cell)).map { case (a, b) => a - b }
        data.collect { case (cid, _) if assignC(cid) == cell =>
          val adist = (0 until m).map { sub =>
            val sq = rq.slice(sub * dsub, sub * dsub + dsub)
            d2(sq, pcb((sub, codesC(cid)(sub))))
          }.sum
          (qid, cid, adist)
        }
      }
    }
    (assignC, residC, codesC.map { case (k, v) => k -> v.map(identity) }, scored)
  }

  test("ivfTopkAdc with nProbe = nCells replays exactly: assignment, residuals, codes, adist, ranking") {
    val m = 2; val nCells = 4; val kCodes = 6
    val (data, _) = clustered(60, 8, nClusters = 4, seed = 90)
    val queries = data.take(4)
    val cands = data.drop(4)

    // the operator's own model state, collected
    val vq = qvDF(cands.map { case (id, v) => id -> v.map(q) }: _*)
    val cents = Pq.centroidsL2(vq, nCells, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // residuals replayed from cents seed the SAME codebooksQ call
    val cells = cents.keys.toSeq.sorted
    val assignC = cands.map { case (id, v) =>
      id -> cells.minBy(c => (d2(v.map(q), cents(c)), c)) }.toMap
    val residC = cands.map { case (id, v) =>
      id -> v.map(q).zip(cents(assignC(id))).map { case (a, b) => a - b }
    }.toMap
    val pcb = Pq.codebooksQ(
        qvDF(cands.map { case (id, _) => id -> residC(id).toSeq }: _*),
        m, kCodes, iters = 0)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap

    val (_, _, _, scored) = replay(cands, queries, cents, pcb, m, nCells)
    val want = scored.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy { case (_, cid, d) => (d, cid) }.take(5).zipWithIndex
        .map { case ((_, cid, d), i) => (qid, i + 1L, cid, d) }
    }.sortBy(r => (r._1, r._2))

    val got = Pq.ivfTopkAdc(vecsDF(queries: _*), vecsDF(cands: _*), k = 5,
        nCells = nCells, nProbe = nCells, m = m, kCodes = kCodes,
        lloydIters = 1, pqIters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == want)
    assert(assignC.values.toSet.subsetOf(cents.keySet)) // shape guard
  }

  test("pruning honesty: every returned candidate lives in a cell the query probed") {
    val m = 2; val nCells = 6; val nProbe = 2
    val (data, _) = clustered(120, 8, nClusters = 6, seed = 91)
    val queries = data.take(8)
    val cands = data.drop(8)
    val vq = qvDF(cands.map { case (id, v) => id -> v.map(q) }: _*)
    val cents = Pq.centroidsL2(vq, nCells, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cells = cents.keys.toSeq.sorted
    def nearest(qv: Seq[Long], n: Int) = cells.sortBy(c => (d2(qv, cents(c)), c)).take(n)
    val assignC = cands.map { case (id, v) => id -> nearest(v.map(q), 1).head }.toMap

    val out = Pq.ivfTopkAdc(vecsDF(queries: _*), vecsDF(cands: _*), k = 10,
        nCells = nCells, nProbe = nProbe, m = m, kCodes = 8, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.nonEmpty)
    val byQ = queries.toMap
    for ((qid, cid) <- out) {
      val probed = nearest(byQ(qid).map(q), nProbe).toSet
      assert(probed.contains(assignC(cid)),
        s"query $qid returned candidate $cid from unprobed cell ${assignC(cid)}")
    }
  }

  test("deterministic across runs (learned centroids + learned residual codebooks)") {
    val (data, _) = clustered(80, 8, nClusters = 5, seed = 92)
    def run() = Pq.ivfTopkAdc(vecsDF(data.take(3): _*), vecsDF(data.drop(3): _*),
        k = 5, nCells = 5, nProbe = 3, m = 2, kCodes = 6,
        lloydIters = 2, pqIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run() == run())
  }

  test("cluster-preserving recall survives real pruning (nProbe 2 of 6)") {
    val (data, cluster) = clustered(160, 16, nClusters = 6, seed = 93)
    val queries = data.take(20)
    val cands = data.drop(20)
    val top1 = Pq.ivfTopkAdc(vecsDF(queries: _*), vecsDF(cands: _*), k = 1,
        nCells = 6, nProbe = 2, m = 4, kCodes = 8, lloydIters = 2, pqIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var hits = 0
    for ((qid, v) <- queries) {
      val qv = v.map(q)
      val exact = cands.minBy { case (cid, cv) => (d2(qv, cv.map(q)), cid) }._1
      if (top1.get(qid).exists(c => cluster(c) == cluster(exact))) hits += 1
    }
    assert(hits >= 18, s"IVFADC cluster-preserving top-1 under pruning: $hits/20")
  }

  test("rerank: every returned distance is the exact quantized squared L2") {
    val (data, _) = clustered(100, 16, nClusters = 5, seed = 94)
    val queries = data.take(5)
    val cands = data.drop(5)
    val byId = cands.toMap
    val out = Pq.ivfTopkAdcRerank(vecsDF(queries: _*), vecsDF(cands: _*),
        k = 5, nCells = 5, nProbe = 3, m = 4, kCodes = 8, rerankFactor = 3,
        lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length == 25)
    val byQ = queries.toMap
    for ((qid, cid, dist) <- out)
      assert(dist == d2(byQ(qid).map(q), byId(cid).map(q)),
        s"($qid, $cid): $dist is not the exact distance")
  }

  test("rerank with full probes and a covering shortlist IS the exact L2 top-k") {
    val (data, _) = clustered(60, 8, nClusters = 4, seed = 95)
    val queries = data.take(4)
    val cands = data.drop(4)
    // k * rerankFactor >= |cands| and nProbe = nCells: nothing is pruned,
    // so rerank must reproduce the exact ranking bit-for-bit
    val got = Pq.ivfTopkAdcRerank(vecsDF(queries: _*), vecsDF(cands: _*),
        k = 3, nCells = 4, nProbe = 4, m = 2, kCodes = 6, rerankFactor = 20,
        lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    val want = queries.flatMap { case (qid, v) =>
      val qv = v.map(q)
      cands.map { case (cid, cv) => (qid, cid, d2(qv, cv.map(q))) }
        .sortBy { case (_, cid, d) => (d, cid) }.take(3).zipWithIndex
        .map { case ((_, cid, d), i) => (qid, i + 1L, cid, d) }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("seedOrder hook: md5-ordered centroid seeds replay exactly (q88's oracle convention)") {
    // the q88 gate hands codebooksQ an order BOTH engines compute:
    // md5 of the id's decimal spelling. Pin the full convention here —
    // seeds = first k by (md5hex, vec_id), cell ids assigned by vec_id
    // order AMONG the selected seeds — so the DuckDB oracle's cseed CTE
    // and this code can never silently drift apart.
    val (data, _) = clustered(50, 8, nClusters = 4, seed = 96)
    val vq = qvDF(data.map { case (id, v) => id -> v.map(q) }: _*)
    val k = 5
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = data.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(k)
      .sorted.zipWithIndex
      .map { case (id, i) => i.toLong -> data.toMap.apply(id).map(q) }.toMap
    val got = Pq.centroidsL2(vq, nCells = k, iters = 0,
        seedOrder = md5(col("vec_id").cast("string").cast("binary")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == want.map { case (c, v) => c -> v.toSeq })
  }

  test("rerank with a custom seedOrder stays exact-distance and covers the exact top-k when nothing is pruned") {
    val (data, _) = clustered(60, 8, nClusters = 4, seed = 97)
    val queries = data.take(4)
    val cands = data.drop(4)
    val so = md5(col("vec_id").cast("string").cast("binary"))
    val got = Pq.ivfTopkAdcRerank(vecsDF(queries: _*), vecsDF(cands: _*),
        k = 3, nCells = 4, nProbe = 4, m = 2, kCodes = 6, rerankFactor = 20,
        seedOrder = so)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2)).toSeq
    val want = queries.flatMap { case (qid, v) =>
      val qv = v.map(q)
      cands.map { case (cid, cv) => (qid, cid, d2(qv, cv.map(q))) }
        .sortBy { case (_, cid, d) => (d, cid) }.take(3).zipWithIndex
        .map { case ((_, cid, d), i) => (qid, i + 1L, cid, d) }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("rejects nProbe > nCells and nProbe < 1") {
    val d = vecsDF(1L -> Seq(0.1f, 0.2f))
    intercept[IllegalArgumentException](
      Pq.ivfTopkAdc(d, d, k = 1, nCells = 2, nProbe = 3, m = 1, kCodes = 1))
    intercept[IllegalArgumentException](
      Pq.ivfTopkAdc(d, d, k = 1, nCells = 2, nProbe = 0, m = 1, kCodes = 1))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.embed.Similarity

/** Per-vector symmetric int8 quantization (q71): value contract,
  * degenerate vectors, reconstruction error bound, and the point of the
  * exercise — neighbor structure survives quantization. */
class QuantizeInt8Spec extends SparkSpec {
  import spark.implicits._

  private def vecsDF(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("max component maps to ±127, zeros stay zero, codes stay in [-127, 127]") {
    val out = Similarity.quantizeInt8(vecsDF(
        1L -> Seq(0.5f, -1.0f, 0.0f, 0.25f),
        2L -> Seq(2.0f, 1.0f)))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    val (s1, q1) = out(1L)
    assert(s1 == 1.0d)
    // floor(127·x/s + 0.5): 0.5→64 (63.5+0.5), -1→-127, 0→0, 0.25→32
    assert(q1 == Seq(64, -127, 0, 32), s"got $q1")
    val (s2, q2) = out(2L)
    assert(s2 == 2.0d && q2 == Seq(127, 64))
  }

  test("all-zero vector quantizes to zeros instead of dividing by zero") {
    val out = Similarity.quantizeInt8(vecsDF(1L -> Seq(0.0f, 0.0f, 0.0f)))
      .collect().head
    assert(out.getDouble(1) == 0.0d && out.getSeq[Int](2) == Seq(0, 0, 0))
  }

  test("reconstruction error is bounded by half a quantization step") {
    val rnd = new scala.util.Random(71)
    val rows = (1L to 50L).map(i => i -> Seq.fill(16)(rnd.nextFloat() * 2f - 1f))
    val out = Similarity.quantizeInt8(vecsDF(rows: _*))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2))).toList
    val byId = rows.toMap
    for ((id, s, q) <- out; (x, qi) <- byId(id).zip(q)) {
      val err = math.abs(x.toDouble - qi * s / 127.0)
      // q = floor(127x/s + .5) is within 1/2 of 127x/s → x̂ within s/254,
      // plus a float-double slack margin
      assert(err <= s / 254.0 + 1e-6, s"vec $id: |$x - ${qi * s / 127.0}| = $err")
      assert(math.abs(qi) <= 127)
    }
  }

  test("nearest-neighbor structure survives: top-1 over int8 codes matches float cosine >= 90%") {
    val rnd = new scala.util.Random(711)
    // clustered vectors so near-neighbors are meaningful, not uniform noise
    val centers = Vector.fill(8)(Array.fill(24)(rnd.nextGaussian()))
    val rows = (1L to 200L).map { i =>
      val c = centers(rnd.nextInt(centers.size))
      i -> c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val floats = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val quant = Similarity.quantizeInt8(vecsDF(rows: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).map(_.toDouble)).toMap
    val ids = rows.map(_._1)
    val agree = ids.count { q =>
      def top1(space: Map[Long, Seq[Double]]) =
        ids.filter(_ != q).maxBy(c => cos(space(q), space(c)))
      top1(floats) == top1(quant)
    }
    assert(agree >= ids.size * 9 / 10, s"top-1 agreement ${agree}/${ids.size}")
  }

  test("NULL embedding degrades per-row (NULL through, no job kill)") {
    val d = spark.sql(
      "SELECT CAST(1 AS BIGINT) AS vec_id, CAST(NULL AS ARRAY<FLOAT>) AS embedding " +
      "UNION ALL SELECT 2, ARRAY(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))")
    val out = Similarity.quantizeInt8(d).orderBy("vec_id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    // -0.5 → floor(-63.5 + 0.5) = -63: halves round toward +∞ — a fixed,
    // engine-portable choice (round() half-modes differ across engines)
    assert(out(1).getSeq[Int](2) == Seq(127, -63))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.embed.{Jl, Similarity}

/** The JL projection's contracts: the md5-parity sign matrix matches an
  * in-engine SQL derivation (so [[Jl.signsSqlValues]] replays are the
  * same matrix), projections match a driver-side exact reference, the
  * JL distance guarantee holds at spec strength on deterministic data
  * (ratios concentrate around 1), and the two-stage read degrades
  * gracefully: with a full-width shortlist [[Jl.jlTopK]] IS
  * [[Similarity.topkCosine]] exactly, and with a narrow shortlist its
  * recall against the exact answer stays high on clustered data. */
class JlSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
  }

  test("sign matrix: md5 parity matches the in-engine SQL derivation") {
    val pairs = for (j <- 0 until 16; i <- Seq(0, 1, 7, 31, 63)) yield (j, i)
    val sql = pairs.map { case (j, i) =>
      spark.sql(
        s"SELECT 1 - 2 * (CAST(conv(substring(md5('$j:$i'), 1, 1), 16, 10) AS BIGINT) % 2)")
        .head().getLong(0)
    }
    assert(pairs.map { case (j, i) => Jl.sign(j, i) } == sql)
    // both signs occur (a degenerate all-+1 matrix would be a bug)
    val all = Jl.signs(16, 64).flatten
    assert(all.contains(1L) && all.contains(-1L))
    assert(all.forall(s => s == 1L || s == -1L))
  }

  test("projection matches the driver-side exact reference; length RAISES; NULL dropped") {
    val data = vecs(20, 8, seed = 7)
    val df = data.toDF("vec_id", "embedding")
    val got = Jl.project(df, "vec_id", "embedding", inDims = 8, outDims = 4)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val ss = Jl.signs(4, 8)
    data.foreach { case (id, emb) =>
      val q = emb.map(x => math.floor(x.toDouble * 1000).toLong)
      val want = ss.map(row => row.zip(q).map { case (s, v) => s * v }.sum)
      assert(got(id) == want, s"vec $id")
    }
    intercept[Exception](
      Jl.project(df, "vec_id", "embedding", inDims = 9, outDims = 4)
        .collect())
    val withNull = df.union(Seq((99L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding"))
    assert(Jl.project(withNull, "vec_id", "embedding", 8, 4).count() == 20)
  }

  test("JL distance guarantee at spec strength: ratios concentrate around 1") {
    val data = vecs(60, 64, seed = 11)
    val df = data.toDF("vec_id", "embedding")
    val proj = Jl.project(df, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val quant = data.map { case (id, e) =>
      id -> e.map(x => math.floor(x.toDouble * 1000).toLong) }.toMap
    val ratios = for {
      (a, qa) <- quant.toSeq; (b, qb) <- quant.toSeq if a < b
    } yield {
      val d2 = qa.zip(qb).map { case (x, y) => (x - y) * (x - y) }.sum
      val pj = proj(a).zip(proj(b)).map { case (x, y) =>
        (x - y) * (x - y) }.sum
      pj.toDouble / 16.0 / d2.toDouble
    }
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.6 && median < 1.6, s"median ratio $median")
    val within3x = ratios.count(r => r > 1.0 / 3 && r < 3.0)
    assert(within3x >= (ratios.size * 0.9).toInt,
      s"only $within3x/${ratios.size} pairs within 3x")
  }

  test("full-width shortlist: jlTopK == topkCosine EXACTLY (rerank covers everything)") {
    val data = vecs(120, 64, seed = 23)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 5)
    val cands = df.filter(col("vec_id") >= 5)
    val exact = Similarity.topkCosine(queries, cands, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val full = Jl.jlTopK(queries, cands, k = 10, shortK = 115)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(full == exact)
  }

  test("narrow shortlist: high recall on clustered data, deterministic output") {
    // 10 tight clusters of 20: true neighbors are co-clustered, JL
    // preserves the cluster gaps, so a 3x shortlist recovers ~all
    val rng = new scala.util.Random(31)
    val centers = Seq.fill(10)(Array.fill(64)(rng.nextFloat() * 2 - 1))
    val data = (0 until 200).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.toSeq.map(x => x + rng.nextFloat() * 0.1f))
    }
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 5)
    val cands = df.filter(col("vec_id") >= 5)
    val exact = Similarity.topkCosine(queries, cands, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val jl = Jl.jlTopK(queries, cands, k = 10, shortK = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & jl).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // determinism: a different partitioning computes the same rows
    val again = Jl.jlTopK(queries.repartition(7), cands.repartition(13),
        k = 10, shortK = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == jl)
  }

  test("guards: outDims/shortK ranges") {
    val df = vecs(3, 8, 1).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](Jl.signs(0, 8))
    intercept[IllegalArgumentException](Jl.signs(65, 8))
    intercept[IllegalArgumentException](
      Jl.jlTopK(df, df, k = 5, shortK = 4))
  }
}

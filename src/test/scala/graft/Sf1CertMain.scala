package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf1 certificate for q91_embed_near_dedup — the one heavyweight gate
  * whose DuckDB oracle does NOT fit at sf1 (r14 measurements):
  *
  *  - a bijective-isometry 10× copy of the driver embeddings leaves
  *    cross-copy cosines at σ ≈ 1/√64 = 0.125, so at the gate's 0.25
  *    threshold the copies legitimately MERGE (measured: 94,416 of
  *    104,781 verified edges were cross-copy) — organic, but it makes
  *    the oracle's recursive closure Σ|component|² ≈ O(n²);
  *  - DuckDB then spills tens of GB and exceeds any sane budget even
  *    with MATERIALIZED CTE hints (measured: >9 min, killed);
  *  - and a "planted well-separated clusters" corpus is impossible at
  *    this dimension: thousands of directions with pairwise |cos| <
  *    0.25 do not FIT in 64 dimensions (spherical packing — measured:
  *    5,000 hash-lattice centers reach max pairwise cosine 0.795).
  *
  * So the certificate cross-checks the gate against an INDEPENDENT
  * Spark construction of the same semantics on the same 20k-vector sf1
  * corpus (the sign-flip organic synth of [[Sf1FullSynthMain]]):
  *
  *   gate path:  multiprobe bucket EQUI-JOIN (13 probe keys/vector) →
  *               distinct candidates → integer-cosine verify →
  *               big-star/small-star closure;
  *   cert path:  brute-force bucket CARTESIAN filtered on
  *               `bit_count(xor) <= 1` — definitionally the multiprobe
  *               candidate set — → the same public verify arithmetic →
  *               the same closure operator.
  *
  * The candidate-enumeration machinery (the scale-sensitive part — the
  * probe explode, the equi-join, the distinct) is thus checked
  * cell-exactly against its definition at sf1 scale. The shared pieces
  * are the bucket/verify ARITHMETIC (hash formulas DuckDB-verified at
  * sf0.001/0.01/0.1 by the standing q91 sweep) and the closure operator
  * (cipher-certified at 50k docs by q90's sf1 oracle run and
  * PlantedTruthMain). Giant merged components are exactly what this
  * corpus produces, so the closure is exercised at its worst shape.
  *
  * Usage: Test/runMain graft.Sf1CertMain
  */
object Sf1CertMain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the Sf1FullSynthMain embeddings construction, inline (self-contained)
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val emb = (0 until 10).map { k =>
      emb0.withColumn("vec_id", col("vec_id") + lit(k.toLong * 1000000L))
        .withColumn("embedding", expr(
          s"""transform(embedding, (e, d) ->
             |  CASE WHEN pmod(xxhash64(d, ${k}L), 2) = 0 THEN e
             |       ELSE -e END)""".stripMargin).cast("array<float>"))
    }.reduce(_ union _).repartition(16)
    val n = emb.count()

    // gate path
    val t0 = System.nanoTime()
    val got = graft.embed.Similarity.embedNearDup(emb, minScore1e6 = 250000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gateSec = (System.nanoTime() - t0) / 1e9
    graft.operators.Checkpoints.releaseAll()

    // cert path: brute-force hamming<=1 candidates + the same public
    // verify arithmetic, closed by the shared closure operator
    val t1 = System.nanoTime()
    val b = graft.embed.Similarity.hyperplaneBuckets(emb, 12)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = b.as("a").join(b.as("b"),
        expr("bit_count(a.bucket ^ b.bucket) <= 1") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vid_a"), col("b.vec_id").as("vid_b"))
    val v = emb.select(col("vec_id"),
        graft.embed.Similarity.quantize(col("embedding")).as("v"))
      .withColumn("nrm", expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = candIds
      .join(v.as("x"), col("vid_a") === col("x.vec_id"))
      .join(v.as("y"), col("vid_b") === col("y.vec_id"))
      .select(col("vid_a"), col("vid_b"),
        expr("aggregate(zip_with(x.v, y.v, (p, q) -> p * q), CAST(0 AS BIGINT), (a, z) -> a + z)")
          .as("dot"),
        col("x.nrm").as("qn"), col("y.nrm").as("cn"))
      .filter(col("qn") =!= 0L && col("cn") =!= 0L)
      .filter(expr(
        "CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) >= 250000"))
      .select(col("vid_a").as("doc_a"), col("vid_b").as("doc_b"))
    val want = graft.text.Dedup.clusters(
        emb.select(col("vec_id").as("doc_id")), edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val certSec = (System.nanoTime() - t1) / 1e9
    b.unpersist(); v.unpersist()
    graft.operators.Checkpoints.releaseAll()

    val ok = got == want
    val nClusters = got.map(_._2).size
    println(f"q91_embed_near_dedup@sf1: ${if (ok) "PASS" else "FAIL"} — " +
      f"n=$n vectors, rows got=${got.size} want=${want.size}, " +
      f"distinct clusters=${got.groupBy(_._2).size}, " +
      f"gate $gateSec%.1f s vs brute-cert $certSec%.1f s" +
      (if (ok) "" else s" | missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}

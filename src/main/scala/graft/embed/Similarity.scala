package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Numeric contract: components are quantized to integers
  * (`floor(x·1000)` as BIGINT) before any arithmetic. Integer dot products
  * and norms are then EXACT (magnitudes << 2^53), so every engine computes
  * identical values regardless of summation order — which makes cosine
  * scores hash-checkable across Spark and DuckDB. The final score is
  * `floor(1e6 · dot / sqrt(na·nb))`: one double divide + sqrt, both
  * correctly rounded IEEE ops, identical everywhere.
  *
  * Scale design:
  *  - [[topkCosine]] (exact baseline): broadcast the query set, one pass
  *    over candidates, per-query top-k via TakeOrdered-style window — cost
  *    O(|candidates|·|queries|·dim) with NO shuffle of the big side beyond
  *    the final k rows per query;
  *  - [[closestPairsBlocked]]: pairs only within a blocking key (here the
  *    `label` column — in production a coarse quantizer/IVF cell id), so
  *    the join is keyed, never cartesian;
  *  - [[hyperplaneBuckets]] (ANN scale path): sign-of-projection signatures
  *    against `nPlanes` deterministic pseudo-random hyperplanes; candidate
  *    generation is a bucket groupBy, O(bucket²) not O(n²). Hyperplane
  *    components derive from [[graft.text.TextOps.xhash]]-style hashing of
  *    (plane, dim), so the index is reproducible with no RNG state.
  */
object Similarity {

  /** Integer quantization of the embedding column — built with the Column
    * API (`transform` HOF), so it composes with ANY input Column, not just
    * bare attribute references (the string-interpolated form broke on
    * computed columns). Used by every operator below. */
  def quantize(embedding: Column, scale: Int = 1000): Column =
    transform(embedding, x => floor(x.cast(DoubleType) * scale).cast(LongType))

  /** Dot product via the native codegen'd [[graft.functions.DotProductLong]]
    * expression (registered per session by the operators below) — a tight
    * primitive loop inside whole-stage codegen, vs interpreted per-element
    * lambdas for the `aggregate(zip_with(...))` HOF form. Same exact
    * integer result. */
  private def dotExpr(a: String, b: String): String = s"dot_long($a, $b)"

  private val scoreExpr =
    "CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT)"

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (q_id, rn, cand_id, score) — rn 1..k by (score desc, cand_id). */
  def topkCosine(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    graft.functions.DotProductLong.register(queries.sparkSession)
    // norms computed ONCE per vector before the join, not once per pair
    val q = queries.select(col("vec_id").as("q_id"),
      quantize(col("embedding")).as("qv"))
      .withColumn("qn", expr(dotExpr("qv", "qv")))
    val c = candidates.select(col("vec_id").as("cand_id"),
      quantize(col("embedding")).as("cv"))
      .withColumn("cn", expr(dotExpr("cv", "cv")))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("cand_id"), col("qn"), col("cn"),
        expr(dotExpr("qv", "cv")).as("dot"))
      .select(col("q_id"), col("cand_id"), expr(scoreExpr).as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "cand_id", "score")
      .orderBy("q_id", "rn")
  }

  /** Globally closest `k` pairs, blocked by a key column (label here; an
    * IVF cell id at scale). Output: (vid_a, vid_b, label, score). */
  def closestPairsBlocked(vectors: DataFrame, blockCol: String, k: Int): DataFrame = {
    graft.functions.DotProductLong.register(vectors.sparkSession)
    // norms computed ONCE per vector before the join, not once per pair
    val v = vectors.select(col("vec_id"), col(blockCol).as("blk"),
      quantize(col("embedding")).as("v"))
      .withColumn("nrm", expr(dotExpr("v", "v")))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vid_a"), col("b.vec_id").as("vid_b"),
        col("a.blk").as("label"),
        expr(dotExpr("a.v", "b.v")).as("dot"),
        col("a.nrm").as("qn"), col("b.nrm").as("cn"))
      .select(col("vid_a"), col("vid_b"), col("label"), expr(scoreExpr).as("score"))
      .orderBy(col("score").desc, col("vid_a"), col("vid_b"))
      .limit(k)
  }

  /** Random-hyperplane LSH signatures: bit j of the signature is the sign
    * of the projection onto a deterministic pseudo-random hyperplane whose
    * component for dimension d is `((a_j·(d+1)) mod P) − P/2` (a fixed,
    * engine-independent integer sequence). Vectors in the same bucket are
    * ANN candidates; [[annTopkCosine]] is the end-to-end search. */
  def hyperplaneBuckets(vectors: DataFrame, nPlanes: Int): DataFrame = {
    val P = graft.text.TextOps.P
    val planes = (0 until nPlanes).map { j =>
      val aj = (2654435761L * (j + 1)) % P
      // projection sign: sum_d v[d] * (((aj*(d+1)) mod P) - P/2)
      val proj = s"""aggregate(
        zip_with(v, sequence(1, size(v)),
          (x, d) -> x * ((($aj * CAST(d AS BIGINT)) % $P) - ${P / 2})),
        CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
      expr(s"CASE WHEN ($proj) > 0 THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END")
    }
    vectors.select(col("vec_id"),
        quantize(col("embedding")).as("v"))
      .withColumn("bucket", planes.reduce(_ + _))
      .select("vec_id", "bucket")
  }

  /** End-to-end approximate top-k: LSH-bucket candidates (multiprobe —
    * each QUERY also probes every bucket at Hamming distance 1, trading
    * nPlanes extra probe keys for recall), then exact integer-cosine
    * re-rank of candidates only. The join is keyed on the bucket — cost
    * O(Σ bucket²)-ish, never |queries|×|candidates|. Approximate by
    * construction: recall is property-tested, not oracle-gated. */
  def annTopkCosine(queries: DataFrame, candidates: DataFrame, k: Int,
                    nPlanes: Int = 12): DataFrame = {
    graft.functions.DotProductLong.register(queries.sparkSession)
    val probes = (0 until nPlanes).map(j => expr(s"CAST(${1L << j} AS BIGINT)")) :+
      expr("CAST(0 AS BIGINT)")
    val qb = hyperplaneBuckets(queries, nPlanes)
      .select(col("vec_id").as("q_id"), explode(array(probes: _*)).as("flip"), col("bucket"))
      .select(col("q_id"), expr("bucket ^ flip").as("probe"))
    val cb = hyperplaneBuckets(candidates, nPlanes)
      .select(col("vec_id").as("cand_id"), col("bucket"))
    val qv = queries.select(col("vec_id").as("q_id"),
      quantize(col("embedding")).as("qv"))
      .withColumn("qn", expr(dotExpr("qv", "qv")))
    val cv = candidates.select(col("vec_id").as("cand_id"),
      quantize(col("embedding")).as("cv"))
      .withColumn("cn", expr(dotExpr("cv", "cv")))
    val cand = qb.join(cb, qb("probe") === cb("bucket"))
      .select("q_id", "cand_id").distinct()
    val scored = cand
      .join(broadcast(qv), "q_id").join(cv, "cand_id")
      .select(col("q_id"), col("cand_id"),
        expr(dotExpr("qv", "cv")).as("dot"), col("qn"), col("cn"))
      .select(col("q_id"), col("cand_id"), expr(scoreExpr).as("score"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("cand_id"))
    scored.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "cand_id", "score")
      .orderBy("q_id", "rn")
  }
}

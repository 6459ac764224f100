package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Johnson–Lindenstrauss random projection over the embedding column —
  * the LINEAR-PROJECTION member of the vector-compression family
  * ([[graft.text.SimHash]] 1-bit signs, [[Pq]] codebooks,
  * [[Similarity.quantizeInt8]] scalar quantization, this one a dense
  * ±1 projection): y = S·q where S is a deterministic `outDims × inDims`
  * sign matrix and q the integer-quantized vector. Achlioptas (2003)
  * showed ±1 entries achieve the JL distance guarantee — with
  * d' = outDims rows, E‖y_a − y_b‖² = d'·‖q_a − q_b‖², concentrated to
  * relative error ~O(1/√d') — so squared distances in the 16-dim
  * projected space rank candidates for exact reranking at half the
  * scanned bytes (16 BIGINTs vs 64 floats) and a quarter of the pair
  * arithmetic. That is the 100 TB read path: PROJECT ONCE at ingest (a
  * narrow map pass, stored beside the vector), shortlist in JL space,
  * rerank the shortlist exactly ([[jlTopK]]). Measured honestly
  * (JlProbeMain, 1e6 memory-resident candidates × 64 queries,
  * local[32]): the per-pair ROW machinery, not the dot arithmetic,
  * dominates at this scale, so the in-memory two-stage read does NOT
  * beat the exact broadcast scan — the win needs the serving shape
  * (stored projections amortized across query batches, scan-bandwidth-
  * bound candidates). The gates certify the EXACTNESS of the
  * composition; q22 stays the in-memory baseline of choice.
  *
  * Determinism contract (the family's): the sign matrix derives from
  * md5("j:i") parity — no RNG state, reproducible on any engine, and
  * [[signsSqlValues]] emits the same matrix as SQL literals so a
  * foreign-engine replay computes the projection cell-for-cell (the
  * `Layout.zValueSql` precedent). All arithmetic is Int64-exact:
  * |y_j| ≤ inDims·max|q| ≪ 2^63, squared distances ≤ outDims·(2·max|y|)²
  * — so projections AND shortlist ranks are oracle-gated, not just
  * spec-gated.
  */
object Jl {

  /** ±1 sign for (output row j, input dim i): parity of the first hex
    * nibble of md5("j:i") — even → +1, odd → −1. The exact arithmetic a
    * SQL replay computes as 1 − 2·(('0x'‖substr(md5(j‖':'‖i),1,1))::INT % 2). */
  def sign(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val nib = (md.digest(s"$j:$i".getBytes("UTF-8"))(0) >> 4) & 0xf
    1L - 2L * (nib % 2)
  }

  /** The full sign matrix, row-major: signs(j)(i). */
  def signs(outDims: Int, inDims: Int): IndexedSeq[IndexedSeq[Long]] = {
    require(outDims >= 1 && outDims <= 64,
      s"outDims must be in [1, 64], got $outDims")
    require(inDims >= 1 && inDims <= 4096,
      s"inDims must be in [1, 4096], got $inDims")
    IndexedSeq.tabulate(outDims, inDims)((j, i) => sign(j, i))
  }

  /** The sign matrix as SQL VALUES rows "(j, i, s), …" — for
    * foreign-engine replays of the projection (join the unnested
    * embedding against this and sum s·q per (vector, j)). */
  def signsSqlValues(outDims: Int, inDims: Int): String =
    signs(outDims, inDims).zipWithIndex.flatMap { case (row, j) =>
      row.zipWithIndex.map { case (s, i) => s"($j, $i, $s)" }
    }.mkString(", ")

  /** Projects `embCol` (array<float|double>, exactly `inDims` wide —
    * anything else RAISES; NULL embeddings are dropped) to an
    * `outDims`-long exact-integer vector: y_j = Σ_i S_ji·⌊x_i·scale⌋.
    * One narrow map pass — no exchange, no join; the sign rows are plan
    * literals. Output: (idCol, `out` ARRAY<BIGINT> of outDims). */
  def project(embeddings: DataFrame, idCol: String, embCol: String,
              inDims: Int = 64, outDims: Int = 16,
              quantScale: Int = 1000, out: String = "jl"): DataFrame = {
    val ss = signs(outDims, inDims)
    require(quantScale >= 1, s"quantScale must be >= 1, got $quantScale")
    Seq(idCol, embCol).foreach(c =>
      require(embeddings.columns.contains(c), s"no such column: $c"))
    // ONE native expression computes the whole projection — each
    // component quantized once, all outDims accumulated in a tight
    // codegen loop ([[graft.functions.JlProjectLong]]; the
    // compositional quantize-HOF + 16 dot_long form gets the quantize
    // alias inlined 16× by CollapseProject and runs interpreted
    // lambdas — measured 20× slower at 1e6 rows). The length guard
    // RAISES inside the expression. Same exact integers, same hashes.
    val projected = org.apache.spark.sql.execution.GraftColumnBridge.column(
      graft.functions.JlProjectLong(
        org.apache.spark.sql.execution.GraftColumnBridge.expression(
          col(embCol)),
        ss.map(_.toArray).toArray, quantScale))
    embeddings.filter(col(embCol).isNotNull)
      .select(col(idCol), projected.as(out))
  }

  /** The oracle-facing exploded form: (idCol, j, y) rows ordered — what
    * a cross-engine SQL replay pins cell-for-cell. */
  def projectRows(embeddings: DataFrame, idCol: String, embCol: String,
                  inDims: Int = 64, outDims: Int = 16,
                  quantScale: Int = 1000): DataFrame =
    project(embeddings, idCol, embCol, inDims, outDims, quantScale)
      .select(col(idCol), posexplode(col("jl")))
      .select(col(idCol), col("pos").cast(LongType).as("j"),
        col("col").as("y"))
      .orderBy(idCol, "j")

  // the shortlist score: 2·a·b − |a|² − |b|² == −‖a−b‖² exactly (same
  // integer), with all three dots on the native kernel and the norms
  // computed once per side — never per pair

  /** Top-k cosine via the JL two-stage read: shortlist `shortK`
    * candidates per query by projected squared distance (ties on
    * cand_id — a strict total order, so the shortlist is deterministic
    * and oracle-replayable), then EXACT integer-cosine rerank of the
    * shortlist only ([[Similarity.topkCosine]] semantics and output
    * shape: (q_id, rn, cand_id, score), rn 1..k by score desc, cand_id).
    * Recall < 1 by construction (a true neighbor can fall outside the
    * shortlist — spec-measured, the [[Similarity.embedNearDup]]
    * precedent); the COMPUTED answer is deterministic and oracle-gated.
    *
    * Scale shape: candidates are scanned ONCE against the broadcast
    * projected queries (a |C|·outDims map pass instead of q22's
    * |C|·inDims), the per-query shortlist moves ≤ shortK rows per
    * (query, partition) ([[Similarity.topkPerQuery]]'s bounded heap),
    * and only |Q|·shortK rows reach the exact rerank join (candidates
    * are semi-join-reduced against the broadcast shortlist BEFORE
    * their quantize projection runs). See the class note for the
    * honest in-memory measurement. */
  def jlTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             shortK: Int, inDims: Int = 64, outDims: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortK >= k, s"shortK ($shortK) must be >= k ($k)")
    graft.functions.DotProductLong.register(queries.sparkSession)
    // the projections are CHECKPOINTED: at 100 TB they are computed at
    // ingest and STORED beside the vectors — materializing here keeps
    // that cost out of the per-pair loop (and out of Catalyst's reach:
    // a collapsed plan would re-run the projection inside the join)
    val qp = graft.operators.Checkpoints.checkpoint(
      project(queries, "vec_id", "embedding", inDims, outDims)
        .select(col("vec_id").as("q_id"), col("jl").as("qjl"))
        .withColumn("qjn", expr("dot_long(qjl, qjl)")))
    val cp = graft.operators.Checkpoints.checkpoint(
      project(candidates, "vec_id", "embedding", inDims, outDims)
        .select(col("vec_id").as("cand_id"), col("jl").as("cjl"))
        .withColumn("cjn", expr("dot_long(cjl, cjl)")))
    // shortlist: topkPerQuery keeps the LARGEST scores — the score IS
    // −‖qjl−cjl‖² via the norm identity (see above). CHECKPOINTED:
    // the rerank consumes it twice (semi-reduce + join), and an
    // RDD-backed frame re-executes its whole upstream per consumer
    val short = graft.operators.Checkpoints.checkpoint(
      Similarity.topkPerQuery(
        cp.crossJoin(broadcast(qp))
          .select(col("q_id"), col("cand_id"),
            (expr("2 * dot_long(qjl, cjl)") - col("qjn") - col("cjn"))
              .as("score")),
        shortK)
        .select(col("q_id"), col("cand_id")))
    // exact rerank of the shortlist only — the q22 arithmetic verbatim.
    // The shortlist is RDD-backed (no stats), so every join around it
    // is HINTED broadcast — unhinted, Spark sort-merge-joined the full
    // candidate table and paid its quantization for every row (measured
    // 7.4 s of a 10 s call at 1e6 candidates). The semi-join reduces
    // candidates to shortlisted ids BEFORE the quantize projection runs.
    val q = queries.select(col("vec_id").as("q_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("qn", expr("dot_long(qv, qv)"))
    val c = candidates
      .select(col("vec_id").as("cand_id"), col("embedding"))
      .join(broadcast(short.select("cand_id").distinct()),
        Seq("cand_id"), "left_semi")
      .select(col("cand_id"),
        Similarity.quantize(col("embedding")).as("cv"))
      .withColumn("cn", expr("dot_long(cv, cv)"))
    val scored = broadcast(short)
      .join(c, Seq("cand_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("cand_id"), col("qn"), col("cn"),
        expr("dot_long(qv, cv)").as("dot"))
      .select(col("q_id"), col("cand_id"),
        expr("""CASE WHEN qn = 0 OR cn = 0 THEN NULL
                ELSE CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
                     / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) END""")
          .as("score"))
    Similarity.topkPerQuery(scored, k)
  }
}

package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.chaining._

/** Product quantization over the integer grid (the PQ of Jégou/Douze/
  * Schmid, "Product quantization for nearest neighbor search", TPAMI
  * 2011): the embedding splits into `m` subvectors; each subspace learns
  * a k-entry codebook; a vector compresses to its m nearest codebook
  * entries — m·log2(k) bits instead of dim·32. ADC (asymmetric distance
  * computation) then scores a query against the coded corpus through one
  * m×k lookup table per query: O(m) integer adds per candidate instead of
  * O(dim) float multiplies. Beside [[Similarity.quantizeInt8]] (4× storage
  * cut, exact dots) and the IVF family (candidate pruning), this is the
  * third leg of the billion-vector scale path — IVF prunes, PQ compresses
  * what remains; [[ivfTopkAdc]] composes both (the paper's IVFADC).
  *
  * Numeric contract (the repo-wide determinism rules): all arithmetic runs
  * on [[Similarity.quantize]]'s integer grid with the native `dot_long`
  * kernel; squared L2 distances come from the dot identity
  * `|a−b|² = |a|² + |b|² − 2·a·b`, so every distance, assignment, and ADC
  * score is an exact BIGINT both engines reproduce. Assignment ties break
  * toward the smallest code; Lloyd means are exact integer `sum DIV count`
  * (a subspace cell that attracts no vectors keeps its previous entry) —
  * the same conventions as [[Similarity.ivfRefine]]. Rows with NULL
  * embeddings are dropped at the subvector split (per-row degradation, as
  * in the cosine family).
  *
  * Scale shape (100 TB): codebooks are m·k subvectors — model-sized, always
  * broadcast. The subvector split and assignment are NARROW (one corpus
  * scan, argmin via map-side partial `max_by`); encode's only exchange is
  * O(n) rows of m codes each. ADC materializes the per-query LUT
  * (|Q|·m·k rows, broadcast) and scans codes once; the only wide step is
  * the (q_id, cand_id) partial-sum exchange, O(n·|Q|) rows AFTER map-side
  * combine of the m per-sub terms, then the bounded-heap partial top-k
  * ([[Similarity.topkPerQuery]]) — never a full sorted candidate list.
  */
object Pq {

  private def dotExpr(a: String, b: String): String = s"dot_long($a, $b)"

  /** (vec_id, qv) integer-grid projection; NULL embeddings dropped. */
  private def quantized(vectors: DataFrame, idCol: String = "vec_id"): DataFrame =
    vectors
      .filter(col("embedding").isNotNull)
      .select(col(idCol).as("vec_id"), Similarity.quantize(col("embedding")).as("qv"))

  /** (ids..., sub, sv) subvector frame from a pre-quantized (ids..., qv)
    * frame — narrow: explode(m) + slice. */
  private def subVectorsQ(vq: DataFrame, idCols: Seq[String], m: Int,
                          d2: Int): DataFrame = {
    val ids = idCols.map(col)
    vq.select(ids :+ explode(sequence(lit(0), lit(m - 1))).as("sub") :+ col("qv"): _*)
      .select(ids :+ col("sub") :+
        slice(col("qv"), col("sub") * d2 + 1, lit(d2)).as("sv"): _*)
  }

  /** Codebooks from caller-chosen seed vectors (k rows): entry `code` of
    * subspace `sub` is seed-rank-`code`'s sub-th subvector (rank = vec_id
    * order). Deterministic and SQL-replayable — the oracle-facing
    * construction; [[codebooks]] below is the learned form. The codebook
    * is MODEL state: seeds are codebook-sized by contract (k ≤ 2^codebits,
    * typically ≤ 256), so they are collected and assembled on the driver —
    * O(k·dim) longs, the same bounded-driver-state class as the IVF
    * centroid sample — rather than ranked with a partitionless window.
    * Output: (sub, code, cv, cn). */
  def seedCodebooks(seeds: DataFrame, m: Int): DataFrame =
    seedCodebooksQ(quantized(seeds), m)

  private def seedCodebooksQ(seedsQ: DataFrame, m: Int,
                             expectK: Option[Int] = None): DataFrame = {
    graft.functions.DotProductLong.register(seedsQ.sparkSession)
    import seedsQ.sparkSession.implicits._
    val rows = seedsQ.select(col("vec_id"), col("qv"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    require(rows.nonEmpty, "seedCodebooks needs at least one non-null seed")
    expectK.foreach(k => require(rows.length == k,
      s"codebooks: k=$k entries requested but the corpus holds only " +
        s"${rows.length} non-NULL vectors — the codebook contract " +
        "(k entries per subspace, all codes present) cannot be met"))
    val d = rows.head._2.size
    require(d % m == 0, s"dim $d not divisible by m=$m")
    require(rows.forall(_._2.size == d), "seed embedding dims differ")
    val d2 = d / m
    val entries = for {
      (code, qv) <- rows.zipWithIndex.map { case ((_, qv), i) => (i.toLong, qv) }
      sub <- 0 until m
    } yield (sub, code, qv.slice(sub * d2, sub * d2 + d2))
    entries.toSeq.toDF("sub", "code", "cv")
      .withColumn("cn", expr(dotExpr("cv", "cv")))
  }

  /** Per-(vector, subspace) nearest codebook entry. argmin |sv−cv|² =
    * argmax (2·sv·cv − |cv|²) — the |sv|² term is constant per row, so the
    * comparison never needs it. Ties toward the smallest code. */
  private def assign(subv: DataFrame, cb: DataFrame,
                     idCols: Seq[String]): DataFrame =
    subv.join(broadcast(cb), Seq("sub"))
      .select(idCols.map(col) :+ col("sub") :+ col("code") :+
        (lit(2L) * expr(dotExpr("sv", "cv")) - col("cn")).as("negd"): _*)
      .groupBy((idCols :+ "sub").map(col): _*)
      .agg(max_by(col("code"), struct(col("negd"), -col("code"))).as("code"))

  private def cbShape(cb: DataFrame): (Int, Int) =
    cb.agg(countDistinct("sub").cast(IntegerType),
      max(size(col("cv")))).head() match { case r => (r.getInt(0), r.getInt(1)) }

  /** Learned codebooks: a deterministic hash-ordered k-sample seeds each
    * subspace (zero-iteration k-means, as [[Similarity.ivfCentroids]]),
    * then `iters` Lloyd rounds of (assign → exact integer subspace means).
    * Each round is checkpoint-scoped like ivfRefine — iterative lineage
    * otherwise re-executes prior rounds under every consumer.
    * Output: (sub, code, cv, cn), k entries per subspace, ALL k codes
    * present every round (starved cells keep their previous entry) —
    * a corpus with fewer than k non-NULL vectors fails fast (require)
    * rather than silently degrading the codebook.
    *
    * `seedOrder` picks WHICH k vectors seed the codebook (first k by
    * (seedOrder(vq), vec_id)); the default xxhash64 order is a uniform
    * deterministic sample. An oracle-replayable gate may pass an order
    * both engines compute (e.g. an md5-hex prefix over the id string) —
    * seed CHOICE is the only part of the construction a foreign engine
    * cannot reproduce, everything downstream is exact integers. */
  def codebooks(vectors: DataFrame, m: Int, k: Int, iters: Int = 0,
                seedOrder: Column = xxhash64(col("vec_id"))): DataFrame =
    codebooksQ(quantized(vectors), m, k, iters, seedOrder)

  private[graft] def codebooksQ(vq: DataFrame, m: Int, k: Int,
                                iters: Int,
                                seedOrder: Column = xxhash64(col("vec_id"))): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    graft.functions.DotProductLong.register(vq.sparkSession)
    val d = vq.select(size(col("qv"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val d2 = d / m
    val seeds = vq
      .orderBy(seedOrder, col("vec_id"))
      .limit(k)
    var cb = seedCodebooksQ(seeds, m, expectK = Some(k))
      .pipe(graft.operators.Checkpoints.checkpoint(_))
    val subv = subVectorsQ(vq, Seq("vec_id"), m, d2)
    for (_ <- 1 to iters) {
      val means = assign(subv, cb, Seq("vec_id"))
        .join(subv, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy("sub", "code", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("c"))
        .groupBy("sub", "code")
        .agg(sort_array(collect_list(struct(col("pos"),
          expr("s DIV c").as("m")))).as("pm"))
        .select(col("sub"), col("code"),
          expr("transform(pm, p -> p.m)").as("cv2"))
      val prev = cb
      cb = prev.as("old").join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("cv2"), col("old.cv")).as("cv"))
        .withColumn("cn", expr(dotExpr("cv", "cv")))
        .pipe(graft.operators.Checkpoints.checkpoint(_))
      graft.operators.Checkpoints.release(prev)
    }
    cb
  }

  /** Encodes the corpus: (vec_id, codes ARRAY<BIGINT>), codes[sub] = the
    * nearest codebook entry of subspace sub. One narrow scan + one O(n)
    * exchange. */
  def encode(vectors: DataFrame, cb: DataFrame): DataFrame =
    encodeQ(quantized(vectors), cb, Seq("vec_id"))

  private def encodeQ(vq: DataFrame, cb: DataFrame,
                      idCols: Seq[String]): DataFrame = {
    graft.functions.DotProductLong.register(vq.sparkSession)
    val (m, d2) = cbShape(cb)
    assign(subVectorsQ(vq, idCols, m, d2), cb, idCols)
      .groupBy(idCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(idCols.map(col) :+
        expr("transform(sc, p -> p.code)").as("codes"): _*)
  }

  /** INCREMENTAL PQ code maintenance — [[Similarity.ivfAssignDelta]]'s
    * sibling for the compressed leg: encode a NEW vector batch against
    * STORED codebooks and fold it into the STORED code table without
    * re-training. An id in both the stored codes and the delta RAISES
    * (disjoint-sides contract); delta rows with NULL embeddings drop at
    * the subvector split like every [[encode]] path. Encoding is
    * per-vector against fixed codebooks, so fold-in ≡ one-shot exactly:
    *
    *   encodeDelta(cb, encode(A, cb), B) == encode(A ∪ B, cb)
    *
    * (spec-pinned) — ADC scores over the updated table equal the
    * from-scratch encode on the same codebooks; codebook age bounds
    * reconstruction error, never the table's shape. The stored table is
    * touched once, narrowly (the id guard) and streams through unchanged;
    * new work is O(|delta| · m · k). Output: the updated (vec_id, codes)
    * table. */
  def encodeDelta(cb: DataFrame, codes: DataFrame, delta: DataFrame): DataFrame = {
    Seq("vec_id", "codes").foreach(c => require(codes.columns.contains(c),
      s"codes must carry (vec_id, codes) — missing $c"))
    Seq("vec_id", "embedding").foreach(c => require(delta.columns.contains(c),
      s"delta must carry (vec_id, embedding) — missing $c"))
    val overlap = codes.select(col("vec_id")).distinct()
      .join(delta.select(col("vec_id")).distinct(), Seq("vec_id"), "left_semi")
      .limit(1).collect()
    require(overlap.isEmpty,
      s"encodeDelta: id ${overlap.headOption.map(_.get(0)).orNull} is " +
        "already in the stored code table — the sides must be disjoint")
    codes.select(col("vec_id"), col("codes")).unionByName(encode(delta, cb))
  }

  /** ADC top-k: per query, squared-L2 lookup table against every codebook
    * entry (pd = |qsub|² + |cv|² − 2·qsub·cv, exact BIGINT), then each
    * coded candidate costs m lookups. Output: (q_id, rn, cand_id, adist) —
    * rn 1..k by (adist asc, cand_id), the approximate distances being
    * EXACT distances to each candidate's reconstruction. */
  def topkAdc(queries: DataFrame, codes: DataFrame, cb: DataFrame,
              k: Int): DataFrame = {
    graft.functions.DotProductLong.register(queries.sparkSession)
    val (m, d2) = cbShape(cb)
    val lut = subVectorsQ(quantized(queries).withColumnRenamed("vec_id", "q_id"),
        Seq("q_id"), m, d2)
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("code"),
        (expr(dotExpr("sv", "sv")) + col("cn")
          - lit(2L) * expr(dotExpr("sv", "cv"))).as("pd"))
    val codesLong = codes.select(col("vec_id").as("cand_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = codesLong
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("q_id", "cand_id")
      .agg(sum("pd").as("adist"))
    Similarity.topkPerQuery(
        scored.select(col("q_id"), col("cand_id"), (-col("adist")).as("score")), k)
      .select(col("q_id"), col("rn"), col("cand_id"), (-col("score")).as("adist"))
      .orderBy("q_id", "rn")
  }

  /** Whole-vector nearest-cell assignment by exact squared L2 — the IVF
    * coarse quantizer of [[ivfTopkAdc]], shared with its spec. `cents` is
    * (cell, cv, cn), model-sized, broadcast. Ties toward the smallest
    * cell. Output: (vec_id, cell). */
  private[graft] def assignCellsL2(vq: DataFrame, cents: DataFrame): DataFrame =
    vq.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        (lit(2L) * expr(dotExpr("qv", "cv")) - col("cn")).as("negd"))
      .groupBy("vec_id")
      .agg(max_by(col("cell"), struct(col("negd"), -col("cell"))).as("cell"))

  /** L2 centroids for the coarse quantizer: whole-vector k-means IS an
    * m=1 product quantizer, so the centroid sample + deterministic Lloyd
    * machinery is [[codebooksQ]] verbatim. Output: (cell, cv, cn). */
  private[graft] def centroidsL2(vq: DataFrame, nCells: Int, iters: Int,
                                 seedOrder: Column = xxhash64(col("vec_id"))): DataFrame =
    codebooksQ(vq, m = 1, k = nCells, iters = iters, seedOrder = seedOrder)
      .select(col("code").as("cell"), col("cv"), col("cn"))

  /** IVFADC (Jégou et al. 2011, §5): the composed billion-vector search
    * path — a coarse L2 quantizer prunes to `nProbe` of `nCells` cells,
    * and PQ codes of the RESIDUAL (vector − its cell centroid) give each
    * surviving candidate an O(m)-lookup ADC score. Encoding residuals
    * rather than raw vectors is what makes a small codebook sharp: the
    * coarse quantizer absorbs the coarse location, so the m×kCodes grid
    * only has to describe the in-cell displacement.
    *
    * Every stage is the deterministic integer machinery above: centroids
    * via [[centroidsL2]] (hash-seeded, exact integer Lloyd), residuals are
    * exact Long differences, one shared residual codebook set via
    * [[codebooksQ]], query-side probes pick the nProbe nearest cells by
    * exact L2 (ties to the smallest cell). Output like [[topkAdc]]:
    * (q_id, rn, cand_id, adist), adist = exact squared L2 between the
    * query's in-cell residual and the candidate's reconstructed residual.
    *
    * Scale shape: centroids and residual codebooks are model-sized
    * broadcasts; the corpus sees one assignment scan + one encode (both
    * narrow before O(n) exchanges). Per query the LUT is nProbe·m·kCodes
    * rows (broadcast), and ONLY candidates whose cell is probed enter the
    * scored join — the wide volume is the probed fraction of the corpus,
    * the 1/nCells·nProbe pruning that makes ADC affordable at 10⁹+
    * vectors. */
  def ivfTopkAdc(queries: DataFrame, candidates: DataFrame, k: Int,
                 nCells: Int, nProbe: Int, m: Int, kCodes: Int,
                 lloydIters: Int = 0, pqIters: Int = 0,
                 seedOrder: Column = xxhash64(col("vec_id"))): DataFrame = {
    require(nCells >= 1 && nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got nProbe=$nProbe nCells=$nCells")
    graft.functions.DotProductLong.register(queries.sparkSession)
    val vq = quantized(candidates)
    val cents = centroidsL2(vq, nCells, lloydIters, seedOrder)
      .pipe(graft.operators.Checkpoints.checkpoint(_))
    // residual frame: (vec_id, cell, qv = vector − centroid[cell]) —
    // checkpointed: it feeds the codebook dim probe, the hash-ordered
    // seed collect, pqIters Lloyd rounds, encode, AND the scored join;
    // without materialization the n×nCells assignment join re-executes
    // under every one of those consumers
    val resid = graft.operators.Checkpoints.checkpoint(
      assignCellsL2(vq, cents)
        .join(vq, "vec_id")
        .join(broadcast(cents), "cell")
        .select(col("vec_id"), col("cell"),
          zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qv")))
    val pcb = codebooksQ(resid.select(col("vec_id"), col("qv")), m, kCodes,
      pqIters, seedOrder)
    val codes = encodeQ(resid, pcb, Seq("vec_id", "cell"))
    val (_, d2) = cbShape(pcb)

    // query side: nProbe nearest cells by exact L2 (|q|² constant per
    // query), then the per-(query, cell) residual feeds the LUT
    val q = quantized(queries).withColumnRenamed("vec_id", "q_id")
    val pw = Window.partitionBy("q_id")
      .orderBy((lit(2L) * expr(dotExpr("qv", "cv")) - col("cn")).desc,
        col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("cell"),
        zip_with(col("qv"), col("cv"), (a, b) => a - b).as("qv"))
    val lut = subVectorsQ(probes, Seq("q_id", "cell"), m, d2)
      .join(broadcast(pcb), Seq("sub"))
      .select(col("q_id"), col("cell"), col("sub"), col("code"),
        (expr(dotExpr("sv", "sv")) + col("cn")
          - lit(2L) * expr(dotExpr("sv", "cv"))).as("pd"))
    val codesLong = codes.select(col("vec_id").as("cand_id"), col("cell"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val scored = codesLong
      .join(broadcast(lut), Seq("cell", "sub", "code"))
      .groupBy("q_id", "cand_id")
      .agg(sum("pd").as("adist"))
    // cents/pcb checkpoints stay live until the caller consumes the
    // result — release is the caller's call (Checkpoints.scoped{} /
    // releaseAll), per the registry contract; the weak registry never
    // pins them beyond reachability
    Similarity.topkPerQuery(
        scored.select(col("q_id"), col("cand_id"), (-col("adist")).as("score")), k)
      .select(col("q_id"), col("rn"), col("cand_id"), (-col("score")).as("adist"))
      .orderBy("q_id", "rn")
  }

  /** IVFADC with exact re-ranking (the production two-stage form — Jégou/
    * Tavenard/Douze/Amsaleg, "Searching in one billion vectors: re-rank
    * with source coding", ICASSP 2011): [[ivfTopkAdc]] shortlists
    * `k·rerankFactor` candidates per query by ADC, then ONLY those rows
    * fetch their true vectors for an exact integer squared-L2 rescore and
    * the final top-k. ADC's lossiness is confined to shortlist membership;
    * every returned distance is exact (engine-checkable, and `dist`
    * replaces `adist` in the output to say so).
    *
    * Scale shape: the rescore joins |Q|·k·rerankFactor shortlist rows —
    * thousands, not the corpus — against the candidate frame on its key
    * (co-partitioned equi-join) with the |Q|-row query side broadcast;
    * everything corpus-sized stays inside [[ivfTopkAdc]]'s pruned path.
    * Output: (q_id, rn, cand_id, dist), rn 1..k by (dist asc, cand_id). */
  def ivfTopkAdcRerank(queries: DataFrame, candidates: DataFrame, k: Int,
                       nCells: Int, nProbe: Int, m: Int, kCodes: Int,
                       rerankFactor: Int = 4, lloydIters: Int = 0,
                       pqIters: Int = 0,
                       seedOrder: Column = xxhash64(col("vec_id"))): DataFrame = {
    require(rerankFactor >= 1, s"rerankFactor must be >= 1, got $rerankFactor")
    val shortlist = ivfTopkAdc(queries, candidates, k * rerankFactor,
        nCells, nProbe, m, kCodes, lloydIters, pqIters, seedOrder)
      .select(col("q_id"), col("cand_id"))
    val q = quantized(queries).select(col("vec_id").as("q_id"),
      col("qv").as("q_qv"))
    val c = quantized(candidates).select(col("vec_id").as("cand_id"),
      col("qv").as("c_qv"))
    // the shortlist is thousands of rows against a corpus-sized c: it
    // must be the broadcast side, or the rescore exchanges the corpus
    val exact = c
      .join(broadcast(shortlist), "cand_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("cand_id"),
        (expr(dotExpr("q_qv", "q_qv")) + expr(dotExpr("c_qv", "c_qv"))
          - lit(2L) * expr(dotExpr("q_qv", "c_qv"))).as("dist"))
    Similarity.topkPerQuery(
        exact.select(col("q_id"), col("cand_id"), (-col("dist")).as("score")), k)
      .select(col("q_id"), col("rn"), col("cand_id"), (-col("score")).as("dist"))
      .orderBy("q_id", "rn")
  }
}

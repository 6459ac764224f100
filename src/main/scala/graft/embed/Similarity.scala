package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.chaining._

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

  /** Per-vector symmetric INT8 quantization — the storage/bandwidth scale
    * path for ANN: 4 bytes/dim float32 → 1 byte of information/dim
    * (`scale` = the vector's max |component|; `q = floor(127·x/scale +
    * 0.5)` ∈ [-127, 127]). At 100 TB of embeddings this is the difference
    * between a candidate scan that is memory-bandwidth-bound on floats
    * and one a quarter the size with EXACT integer dot products
    * ([[graft.functions.DotProductLong]]) on the quantized codes —
    * approximate in the vector, exact (hence hash-checkable and
    * engine-portable) in the arithmetic.
    *
    * Determinism contract: `floor(x·127/s + 0.5)` written EXACTLY in that
    * double-op order — `round()` is not used because half-rounding modes
    * differ across engines, while this expression is three correctly
    * rounded IEEE ops every engine computes bit-identically. An all-zero
    * vector (scale 0) quantizes to zeros; a NULL embedding stays NULL.
    * Output: (vec_id, scale DOUBLE, q8 ARRAY<INT>) — narrow, one scan,
    * no exchange. */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val s = array_max(transform(col("embedding"), x => abs(x))).cast(DoubleType)
    embeddings
      .select(col("vec_id"), s.as("scale"), col("embedding"))
      .select(col("vec_id"), col("scale"),
        when(col("scale") === 0d, transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"),
            x => floor(x.cast(DoubleType) * lit(127.0) / col("scale") + lit(0.5))
              .cast(IntegerType)))
          .as("q8"))
  }

  /** Dot product via the native codegen'd [[graft.functions.DotProductLong]]
    * expression (registered per session by the operators below) — a tight
    * primitive loop inside whole-stage codegen, vs interpreted per-element
    * lambdas for the `aggregate(zip_with(...))` HOF form. Same exact
    * integer result. */
  private def dotExpr(a: String, b: String): String = s"dot_long($a, $b)"

  // zero-norm guard: a vector whose components all quantize to 0 has
  // qn = 0; the naked division then yields NaN, and CAST(FLOOR(NaN)) under
  // Spark 4's default ANSI mode kills the JOB on one degenerate row.
  // NULL instead: threshold filters drop it, descending top-k orders it
  // last — per-row degradation. (The DuckDB oracles carry the same CASE.)
  private val scoreExpr =
    """CASE WHEN qn = 0 OR cn = 0 THEN NULL
      |ELSE CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
      |     / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) END""".stripMargin

  /** Distributed per-query top-k over a scored (q_id, cand_id, score)
    * stream — TakeOrdered, not a naked window: a bare
    * `row_number().over(partitionBy(q_id))` shuffles EVERY candidate's
    * score for a query into one task. Each input partition first reduces
    * to its own top-k per query with a BOUNDED heap in `mapPartitions` —
    * not a `collect_list` aggregate, whose map-side partial buffers hold
    * every row of the group and only truncate AFTER the exchange (the
    * round-4 form moved all scored rows packed in lists; this moves at
    * most k rows per (query, partition), memory k·|queries| per task).
    * The kept set is order-independent — ties break on cand_id, a strict
    * total order — so results are partitioning-invariant. NULL scores
    * (zero-norm vectors) drop out, matching the window form's
    * NULLS-LAST + filter. */
  private[graft] def topkPerQuery(scored: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the casts below must be lossless: a fractional score would silently
    // truncate (reordering ties), a non-integral id would corrupt keys
    Seq("q_id", "cand_id", "score").foreach { c =>
      val dt = scored.schema(c).dataType
      require(dt == LongType || dt == IntegerType,
        s"topkPerQuery expects integral '$c', got $dt")
    }
    val spark = scored.sparkSession
    // max-of-ordering = WORST kept element: smaller score is "greater",
    // then larger cand_id — so dequeue() evicts the right row
    val worstFirst = Ordering.by[(Long, Long), (Long, Long)] {
      case (score, cand) => (-score, cand)
    }
    val partialRdd = scored
      // NULL ids would NPE in the RDD map below; degrade like NULL scores
      .filter(col("score").isNotNull && col("q_id").isNotNull && col("cand_id").isNotNull)
      .select(col("q_id").cast(LongType), col("cand_id").cast(LongType),
        col("score").cast(LongType))
      .rdd.mapPartitions { it =>
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Long, Long)]]
        it.foreach { r =>
          val heap = heaps.getOrElseUpdate(r.getLong(0),
            scala.collection.mutable.PriorityQueue.empty(worstFirst))
          val e = (r.getLong(2), r.getLong(1))
          if (heap.size < k) heap.enqueue(e)
          else if (worstFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }
        }
        heaps.iterator.flatMap { case (q, heap) =>
          heap.iterator.map { case (score, cand) => Row(q, cand, score) }
        }
      }
    val perPart = spark.createDataFrame(partialRdd, StructType(Seq(
      StructField("q_id", LongType, nullable = false),
      StructField("cand_id", LongType, nullable = false),
      StructField("score", LongType, nullable = false))))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("cand_id"))
    perPart.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "cand_id", "score")
      .orderBy("q_id", "rn")
  }

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
    topkPerQuery(scored, k)
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

  /** All same-block pairs whose integer cosine score clears `minScore1e6`
    * — the exact verification kernel of embedding near-dedup (the block is
    * a label here; an IVF cell / LSH bucket id at scale, which is exactly
    * how [[embedNearDup]] uses it). Keyed join, never cartesian.
    * Output: (vid_a, vid_b, label, score), vid_a < vid_b. */
  def cosinePairsBlocked(vectors: DataFrame, blockCol: String, minScore1e6: Long): DataFrame = {
    graft.functions.DotProductLong.register(vectors.sparkSession)
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
      .filter(col("score") >= minScore1e6)
      .orderBy("vid_a", "vid_b")
  }

  /** Embedding-cosine near-duplicate clusters — the vector analogue of
    * [[graft.text.Dedup.nearDedup]]: hyperplane-LSH buckets generate
    * candidate pairs (multiprobe on one side, so vectors whose signatures
    * differ by <= 1 bit still meet), exact integer-cosine verification
    * keeps pairs with score >= `minScore1e6`, and min-label propagation
    * clusters the survivors. Output: (vec_id, cluster).
    *
    * Never all-pairs: candidates come from the bucket equi-join. Recall is
    * approximate by construction (property-tested, not oracle-gated) — at
    * near-dup thresholds (cosine ≥ ~0.9) sign-LSH recall is high; for
    * exact semantics within a known blocking key use
    * [[cosinePairsBlocked]] + [[graft.text.Dedup.clusters]]. */
  def embedNearDup(vectors: DataFrame, minScore1e6: Long, nPlanes: Int = 12): DataFrame = {
    graft.functions.DotProductLong.register(vectors.sparkSession)
    // both self-join sides would otherwise re-run the nPlanes·dim bucket
    // build (and the quantize+norm pass below) once per branch — the same
    // 2×-dominant-cost hazard bitmapSignatures checkpoints against
    val b = graft.operators.Checkpoints.checkpoint(hyperplaneBuckets(vectors, nPlanes))
    val probes = (0 until nPlanes).map(j => expr(s"CAST(${1L << j} AS BIGINT)")) :+
      expr("CAST(0 AS BIGINT)")
    val pa = b.select(col("vec_id").as("vid_a"), explode(array(probes: _*)).as("flip"), col("bucket"))
      .select(col("vid_a"), expr("bucket ^ flip").as("probe"))
    val pb = b.select(col("vec_id").as("vid_b"), col("bucket"))
    val cand = pa.join(pb, pa("probe") === pb("bucket") && col("vid_a") < col("vid_b"))
      .select("vid_a", "vid_b").distinct()
    val v = vectors.select(col("vec_id"), quantize(col("embedding")).as("v"))
      .withColumn("nrm", expr(dotExpr("v", "v")))
      .pipe(graft.operators.Checkpoints.checkpoint(_))
    val edges = cand
      .join(v.as("a"), col("vid_a") === col("a.vec_id"))
      .join(v.as("b"), col("vid_b") === col("b.vec_id"))
      .select(col("vid_a"), col("vid_b"),
        expr(dotExpr("a.v", "b.v")).as("dot"),
        col("a.nrm").as("qn"), col("b.nrm").as("cn"))
      .select(col("vid_a"), col("vid_b"), expr(scoreExpr).as("score"))
      .filter(col("score") >= minScore1e6)
      .select(col("vid_a").as("doc_a"), col("vid_b").as("doc_b"))
    graft.text.Dedup.clusters(vectors.select(col("vec_id").as("doc_id")), edges)
      .select(col("doc_id").as("vec_id"), col("cluster"))
  }

  /** Random-hyperplane LSH signatures: bit j of the signature is the sign
    * of the projection onto a deterministic pseudo-random hyperplane whose
    * component for dimension d is `((a_j·(d+1)) mod P) − P/2` (a fixed,
    * engine-independent integer sequence). Vectors in the same bucket are
    * ANN candidates; [[annTopkCosine]] is the end-to-end search. */
  def hyperplaneBuckets(vectors: DataFrame, nPlanes: Int): DataFrame = {
    // 63, not 64: bit j comes from shiftleft(1, j) (wraps mod 64 past
    // that) and the signature is combined with + (a collision would CARRY
    // into the next bit, silently corrupting every downstream bucket and
    // probe mask); SimHash carries the same bound for the same reason
    require(nPlanes >= 1 && nPlanes <= 63, s"need 1 <= nPlanes <= 63, got $nPlanes")
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
    topkPerQuery(scored, k)
  }

  /** IVF coarse quantizer: `nCells` centroids as a deterministic
    * hash-ordered sample of the corpus — k-means with zero Lloyd
    * iterations, the standard cheap coarse quantizer (iterate means
    * offline if cells must be tighter; the index stays a plain DataFrame).
    * Output: (cell, cv, cn) with cell 0..nCells-1.
    *
    * The TakeOrdered sample is per-partition heaps + a driver merge of
    * nCells·P rows; the centroid table is then ASSEMBLED ON THE DRIVER
    * (cell ids by vec_id order among the sample) exactly like
    * [[Pq.seedCodebooks]] — centroids are MODEL state, nCells rows by
    * contract, so a local relation replaces both the former partitionless
    * cell-id window (flagged by the gate plan audit once q89 made this a
    * gate path) and the checkpoint that guarded its whole-corpus sample
    * lineage from double execution.
    *
    * `seedOrder` picks WHICH vectors seed the cells (first nCells by
    * (seedOrder, vec_id)); the default xxhash64 order is a uniform
    * deterministic sample, and an oracle-replayable gate passes an order
    * a foreign engine computes too (q88/q89's md5-hex convention — seed
    * CHOICE is the only construction step an oracle can't rederive). */
  def ivfCentroids(vectors: DataFrame, nCells: Int,
                   seedOrder: Column = xxhash64(col("vec_id"))): DataFrame = {
    graft.functions.DotProductLong.register(vectors.sparkSession)
    import vectors.sparkSession.implicits._
    val rows = vectors
      .select(col("vec_id"), quantize(col("embedding")).as("cv"))
      .orderBy(seedOrder, col("vec_id"))
      .limit(nCells)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    rows.zipWithIndex
      .map { case ((_, cv), i) => (i.toLong, cv) }.toSeq.toDF("cell", "cv")
      .withColumn("cn", expr(dotExpr("cv", "cv")))
  }

  /** Optional Lloyd refinement for [[ivfCentroids]]: `iters` rounds of
    * (broadcast argmax assignment → per-cell component mean). Tightens
    * cells so recall at a fixed nProbe rises, at one assignment pass plus
    * one O(n·dim)-row shuffle per iteration — an offline index-build cost.
    *
    * Deterministic end to end: assignment ties break toward the smallest
    * cell ([[ivfAssign]]); the mean is exact integer `sum DIV count` over
    * the quantized grid (components |x| <= ~2^11·scale, so a Long sum is
    * exact past 2^50 rows per cell); a cell that attracts no vectors keeps
    * its previous centroid (cell ids and count stay stable). Centroid
    * norms are NOT re-normalized — cosine scoring divides them out.
    * Each round is local-checkpointed: iterative lineage otherwise grows
    * geometrically and re-executes prior rounds under both consumers. */
  def ivfRefine(vectors: DataFrame, centroids: DataFrame, iters: Int = 1): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val v = vectors.select(col("vec_id"), quantize(col("embedding")).as("qv"))
    var cents = centroids
    for (_ <- 1 to iters) {
      val means = ivfAssign(vectors, cents)
        .join(v, "vec_id")
        .select(col("cell"), posexplode(col("qv")))
        .groupBy("cell", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("c"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"),
          expr("s DIV c").as("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, p -> p.m)").as("cv2"))
      val prev = cents
      cents = cents.as("old").join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("cv2"), col("old.cv")).as("cv"))
        .withColumn("cn", expr(dotExpr("cv", "cv")))
        .pipe(graft.operators.Checkpoints.checkpoint(_)) // eager: materializes now
      // the prior round fed this one and nothing else; never release the
      // caller's centroids
      if (!(prev eq centroids)) graft.operators.Checkpoints.release(prev)
    }
    cents
  }

  /** Assigns every vector to its max-cosine centroid cell. Centroids are
    * MODEL state (nCells · dim ints) — collected to the driver and served
    * as plan literals, so the argmax is a PER-ROW fold (`array_max` over
    * (score, −cell) structs — max score, tie toward the smallest cell id,
    * the same total order the old `max_by` computed): one narrow
    * projection, NO join, NO exchange — the
    * [[graft.embed.Clustering]] scoreAssign shape applied to the IVF leg
    * (at nCells=1024+ on 100 TB the assign stage stays a scan). Exact
    * integer dot products and the q22 score arithmetic, value-identical
    * to the former broadcast-join form (oracle-gated via q88/q89/q238).
    * Zero-norm vectors score NULL against every cell and deterministically
    * land in cell 0 (score coalesced to Long.MinValue). */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.DotProductLong.register(vectors.sparkSession)
    import vectors.sparkSession.implicits._
    val cents = centroids.select(col("cell").cast(LongType), col("cv"), col("cn"))
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    require(cents.nonEmpty, "ivfAssign: empty centroid table")
    val centLit = array(cents.map { case (cell, cv, cn) =>
      struct(lit(cell).as("cell"), array(cv.map(lit): _*).as("cv"),
        lit(cn).as("cn"))
    }.toIndexedSeq: _*)
    val v = vectors.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("qn", expr(dotExpr("qv", "qv")))
    def score(c: Column): Column = {
      val dot = aggregate(zip_with(col("qv"), c.getField("cv"),
        (x, y) => x * y), lit(0L), (a, b) => a + b)
      // EXACTLY the q22 scoreExpr arithmetic: floor(1e6·dot/√(qn·cn)),
      // NULL when either norm is 0 (or the vector is NULL) — coalesced
      // to Long.MinValue so degenerate rows lose to any scored cell
      coalesce(
        when(col("qn") === 0L || c.getField("cn") === 0L,
          lit(null).cast(LongType))
          .otherwise(floor(lit(1000000.0) * dot.cast(DoubleType)
            / sqrt(col("qn").cast(DoubleType)
              * c.getField("cn").cast(DoubleType))).cast(LongType)),
        lit(Long.MinValue))
    }
    val best = array_max(transform(centLit, c =>
      struct(score(c).as("s"), (-c.getField("cell")).as("nc"))))
    v.select(col("vec_id"), (-best.getField("nc")).as("cell"))
  }

  /** INCREMENTAL IVF index maintenance — the similarity family's
    * warm-start contract (completing the set: q227 text dedup, q231
    * components, q235 centroids, q236 semantic dedup): assign a NEW
    * vector batch into a STORED inverted file WITHOUT re-training.
    * `centroids` is the stored (cell, cv, cn) model ([[ivfCentroids]] /
    * [[ivfRefine]] output), `inverted` the stored (vec_id, cell) file
    * ([[ivfAssign]] shape). Guards, loud not silent: an id in BOTH the
    * stored file and the delta RAISES (the dedupDelta disjoint-sides
    * contract — re-assigning an indexed vector has no right answer
    * without a delete protocol), and a duplicate cell id in the model
    * RAISES (two centroids for one cell, the kmeansAssign stance).
    * Delta rows with NULL embeddings are dropped (per-row degradation,
    * the [[Pq]] convention — they name nothing searchable).
    *
    * Because assignment is per-vector against FIXED centroids, fold-in
    * is EXACTLY one-shot:
    *
    *   ivfAssignDelta(c, ivfAssign(A, c), B) == ivfAssign(A ∪ B, c)
    *
    * (spec-pinned), so search recall over the updated file equals the
    * from-scratch index built on the same model — recall depends only
    * on the MODEL's age (a stale model degrades recall, never the
    * file's correctness), which is the same serving caveat
    * [[graft.embed.Clustering.semDedupDelta]] documents.
    *
    * Scale shape: the stored file contributes one narrow pass (the id
    * overlap guard) and streams through unchanged — corpus vectors are
    * never re-scored, never even read; the new work is O(|delta| ·
    * nCells) map-side scoring against the broadcast model. Output: the
    * UPDATED inverted file (vec_id, cell). */
  def ivfAssignDelta(centroids: DataFrame, inverted: DataFrame,
                     delta: DataFrame): DataFrame = {
    Seq("cell", "cv", "cn").foreach(c => require(centroids.columns.contains(c),
      s"centroids must carry (cell, cv, cn) — missing $c"))
    Seq("vec_id", "cell").foreach(c => require(inverted.columns.contains(c),
      s"inverted must carry (vec_id, cell) — missing $c"))
    Seq("vec_id", "embedding").foreach(c => require(delta.columns.contains(c),
      s"delta must carry (vec_id, embedding) — missing $c"))
    val shape = centroids.agg(count(lit(1)), countDistinct(col("cell"))).head()
    require(shape.getLong(0) == shape.getLong(1),
      "ivfAssignDelta: duplicate cell ids in the centroid model")
    val overlap = inverted.select(col("vec_id")).distinct()
      .join(delta.select(col("vec_id")).distinct(), Seq("vec_id"), "left_semi")
      .limit(1).collect()
    require(overlap.isEmpty,
      s"ivfAssignDelta: id ${overlap.headOption.map(_.get(0)).orNull} is " +
        "already in the stored inverted file — the sides must be disjoint")
    inverted.select(col("vec_id"), col("cell"))
      .unionByName(ivfAssign(delta.filter(col("embedding").isNotNull),
        centroids))
  }

  /** End-to-end IVF ANN top-k: build centroids from the candidate corpus,
    * assign candidates to cells (the inverted file), have each query probe
    * its `nProbe` nearest cells, and exactly re-rank only the vectors in
    * those cells. Cost: |queries|·nProbe·avgCell exact scores instead of
    * |queries|·|candidates|. Approximate by construction — recall is
    * property-tested (the scale knobs are nCells ~ sqrt(n) and nProbe). */
  def ivfTopkCosine(queries: DataFrame, candidates: DataFrame, k: Int,
                    nCells: Int = 16, nProbe: Int = 4,
                    refineIters: Int = 0,
                    seedOrder: Column = xxhash64(col("vec_id"))): DataFrame = {
    graft.functions.DotProductLong.register(queries.sparkSession)
    val cents = ivfRefine(candidates,
      ivfCentroids(candidates, nCells, seedOrder), refineIters)
    val inverted = ivfAssign(candidates, cents)
      .select(col("vec_id").as("cand_id"), col("cell"))
    val q = queries.select(col("vec_id").as("q_id"),
      quantize(col("embedding")).as("qv"))
      .withColumn("qn", expr(dotExpr("qv", "qv")))
    val pw = Window.partitionBy("q_id").orderBy(col("score").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("cell"),
        expr(dotExpr("qv", "cv")).as("dot"), col("qn"), col("cn"))
      .select(col("q_id"), col("cell"), expr(scoreExpr).as("score"))
      .withColumn("rn", row_number().over(pw))
      .filter(col("rn") <= nProbe)
      .select("q_id", "cell")
    val cand = probes.join(inverted, "cell").select("q_id", "cand_id")
    val cv = candidates.select(col("vec_id").as("cand_id"),
      quantize(col("embedding")).as("cv"))
      .withColumn("cn", expr(dotExpr("cv", "cv")))
    val scored = cand
      .join(broadcast(q), "q_id").join(cv, "cand_id")
      .select(col("q_id"), col("cand_id"),
        expr(dotExpr("qv", "cv")).as("dot"), col("qn"), col("cn"))
      .select(col("q_id"), col("cand_id"), expr(scoreExpr).as("score"))
    topkPerQuery(scored, k)
  }
}

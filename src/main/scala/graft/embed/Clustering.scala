package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Embedding clustering — deterministic, integer-exact Lloyd (k-means)
  * iterations over quantized vectors, the curation primitive the
  * similarity family builds on (IVF cell training, SemDeDup-style
  * semantic dedup, domain balancing). The design goal is the family's
  * usual one: EVERY arithmetic step is exact integer math both engines
  * reproduce bit-for-bit, so cluster assignments are hash-gateable —
  * no float-summation-order knife edges anywhere.
  *
  * The determinism recipe:
  *  - values quantize on the q54 grid, SHIFTED positive:
  *    `q = FLOOR((x + 2) · quantScale)` — translation leaves every
  *    pairwise distance unchanged, and an all-positive domain makes
  *    truncating and flooring integer division agree across engines;
  *  - seeds are the k ids with the smallest `md5(CAST(id AS STRING))`
  *    (hex order, id tiebreak) — deterministic "random" the oracle
  *    replays, cluster labels are the SEED ids (stable, engine-free);
  *  - centroids are QUANTIZED to a fixed 1/centScale grid:
  *    `r_d = (Σ q_d) · centScale div n` — exact integers, so the
  *    assignment compare `Σ (q_d·centScale − r_d)²` is exact Int64
  *    (bounds: |q·centScale| ≤ ~3.1e6 at the defaults, squared-diff
  *    sums ≤ ~2.4e15 per 64-dim vector — far inside Int64 even at
  *    millions of rows per cluster);
  *  - argmin ties break on cluster id (smallest wins) — total order,
  *    no unspecified behavior;
  *  - a cluster that loses all members KEEPS its previous centroid
  *    (stable ids, deterministic; it can re-acquire points later).
  *
  * This is "k-means with centroids on a 1/centScale grid" — the
  * quantization error per coordinate is below the DATA's own
  * quantization step, so it converges like textbook Lloyd while being
  * exactly replayable (the q92 integer-exact-replay stance applied to
  * clustering).
  *
  * Scale shape (the MLlib layout): per round, ONE map-side pass scores
  * every point against the k·d centroid literals (no join — centroids
  * are O(k·d) driver state, the splitter-collect exemption class) and
  * folds the argmin PER ROW (`array_min` over (d2, cluster) structs —
  * no explode, no window, no exchange in the assign stage), and ONE
  * map-side-combined agg over (cluster, dim) rebuilds centroids. The
  * per-round exchange is the O(N·d) centroid-rebuild rows + O(k·d)
  * centroid cells — never O(N·k), never pairwise; rounds are
  * driver-chained with a k·d collect each (the O(R) collect class,
  * like splitters). */
object Clustering {

  /** Quantize + shift an embedding column to the all-positive integer
    * grid; values outside (−shift+0.1, shift−0.1) RAISE — a silent
    * clamp would warp distances (the Layout domain-guard stance). */
  private def quantize(vec: Column, quantScale: Long, shift: Double): Column =
    transform(vec, x => {
      val xd = x.cast("double")
      when(xd.isNull || abs(xd) >= shift - 0.1, raise_error(format_string(
          s"kmeans: embedding value %s outside the quantization domain " +
            s"(|x| < ${shift - 0.1}) — rescale embeddings first",
          xd.cast("string"))))
        .otherwise(floor((xd + shift) * quantScale).cast(LongType))
    })

  /** Scores quantized points against driver-held centroids and keeps
    * each point's argmin (ties on cluster id): (__km_id, __km_q,
    * cluster, d2). The centroid literals are O(k·d) plan constants — no
    * join, the MLlib serving shape.
    *
    * NARROW by construction (the r14-verdict fix): the argmin is a
    * per-row fold — `transform` scores the row against each centroid
    * literal and `array_min` takes the lexicographic minimum of the
    * (d2, cluster) structs, which IS the (d2 asc, cluster asc) total
    * order the family pins. One map pass, no explode, no Exchange, no
    * Window — per-round cost is O(N·k·d) arithmetic inside a single
    * projection, so at k=1024+ on 100 TB the assign stage stays a scan
    * (the prior explode + partitionBy(id) window shuffled N·k rows per
    * round). Same exact integer semantics, hash-identical output. */
  private def scoreAssign(points: DataFrame, cents: Seq[(Long, Seq[Long])],
                          centScale: Long): DataFrame = {
    val centLit = array(cents.map { case (cid, r) =>
      struct(lit(cid).as("cluster"), array(r.map(lit): _*).as("r"))
    }: _*)
    val scored = transform(centLit, c => struct(
      aggregate(
        zip_with(col("__km_q"), c.getField("r"),
          (x, r) => (x * centScale - r) * (x * centScale - r)),
        lit(0L), (a, b) => a + b).as("d2"),
      c.getField("cluster").as("cluster")))
    points
      .select(col("__km_id"), col("__km_q"), array_min(scored).as("__km_b"))
      .select(col("__km_id"), col("__km_q"),
        col("__km_b.cluster").as("cluster"), col("__km_b.d2").as("d2"))
  }

  /** Dim-aware Int64 headroom for the d2 sums (checked once the vector
    * dimensionality is known): with the domain guard |x| < 1.9 the
    * quantized coordinates sit in [0, 3.9·quantScale], so a squared diff
    * on the centScale grid is ≤ (3.9·Q)² with Q = quantScale·centScale,
    * and a d-dim sum is ≤ d·(3.9·Q)². Q past sqrt(Long.Max/d)/3.9 could
    * overflow AT RUNTIME (ANSI abort mid-job on the worst row) —
    * rejected upfront instead. The defaults (Q = 1 024 000, d = 64)
    * clear the bound by ~100×. */
  private def requireD2Headroom(q: Long, dims: Int): Unit = {
    val maxQ = (math.sqrt(Long.MaxValue.toDouble / math.max(dims, 1)) / 3.9).toLong
    require(q <= maxQ,
      s"quantScale*centScale = $q exceeds the Int64-safe bound $maxQ for " +
        s"dim-$dims vectors (a d2 sum could overflow); lower the scales")
  }

  /** The shared Lloyd loop: returns the final assignment (internal
    * column names) and the centroid model that produced it. */
  private def lloyd(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    rounds: Int, quantScale: Long, centScale: Long,
                    seedIds: Option[Seq[Long]])
      : (DataFrame, Seq[(Long, Seq[Long])]) = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    seedIds.foreach(s => require(s.nonEmpty && s.size == s.distinct.size &&
      s.size <= k, s"seedIds must be <= k distinct ids, got ${s.size}"))
    require(rounds >= 1 && rounds <= 64, s"rounds must be in [1, 64], got $rounds")
    require(quantScale >= 1 && centScale >= 1 &&
      quantScale * centScale <= (1L << 32),
      "quantScale*centScale must stay <= 2^32 (coarse cap; the dim-aware " +
        "Int64 d2 bound is checked at seed time)")
    Seq(idCol, vecCol).foreach(c =>
      require(df.columns.contains(c), s"no such column: $c"))

    val points = graft.operators.Checkpoints.checkpoint(
      df.select(col(idCol).as("__km_id"),
        quantize(col(vecCol), quantScale, 2.0).as("__km_q")))

    // deterministic seeds: k smallest (md5(id), id) — or the caller's
    // explicit ids (custom init / planted-truth specs); labels = seed ids
    val seedRows = seedIds match {
      case Some(ids) =>
        val got = points.filter(col("__km_id").isin(ids: _*)).collect()
        require(got.length == ids.size,
          s"seedIds: ${ids.size - got.length} ids not present in the input")
        got
      case None => points
        .orderBy(md5(col("__km_id").cast("string").cast("binary")), col("__km_id"))
        .limit(k).collect()
    }
    require(seedRows.nonEmpty, "kmeans: empty input")
    requireD2Headroom(quantScale * centScale, seedRows.head.getSeq[Long](1).size)
    // centroid state lives on the driver (O(k·d), the MLlib layout)
    var cents: Seq[(Long, Seq[Long])] = seedRows.map(r =>
      r.getLong(0) -> r.getSeq[Long](1).map(_ * centScale)).toSeq

    var round = 1
    var assigned = scoreAssign(points, cents, centScale)
    while (round < rounds) {
      // rebuild centroids: one map-side-combined (cluster, dim) agg,
      // then a k·d collect back to the driver literal
      val upd = assigned.select(col("cluster"), posexplode(col("__km_q")))
        .groupBy("cluster", "pos")
        .agg(sum("col").as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"),
          expr(s"(s * ${centScale}L) div n").as("rd"))
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("rd")))),
          x => x.getField("rd")).as("r"))
        .collect()
      val fresh = upd.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      // empty clusters keep their previous centroid (stable ids)
      cents = cents.map { case (cid, old) => cid -> fresh.getOrElse(cid, old) }
      assigned = scoreAssign(points, cents, centScale)
      round += 1
    }
    (assigned, cents)
  }

  /** Lloyd rounds over `df(idCol, vecCol)`: `rounds` assignment passes
    * with centroids refreshed between them (so centroids update
    * rounds−1 times). Returns (idCol, cluster, d2): the final
    * assignment, cluster = seed id, d2 = exact squared distance to the
    * winning quantized centroid in (quantScale·centScale)⁻² units. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             rounds: Int, quantScale: Long = 1000L,
             centScale: Long = 1024L,
             seedIds: Option[Seq[Long]] = None): DataFrame = {
    val (assigned, _) = lloyd(df, idCol, vecCol, k, rounds, quantScale,
      centScale, seedIds)
    assigned.select(col("__km_id").as(idCol), col("cluster"), col("d2"))
      .orderBy(idCol)
  }

  /** The trained MODEL as a storable table: (cluster, r ARRAY<BIGINT>) —
    * the centroids (in 1/(quantScale·centScale) grid units) that
    * produced [[kmeans]]'s final assignment for the same parameters.
    * Store it; serve with [[kmeansAssign]]. */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
                      rounds: Int, quantScale: Long = 1000L,
                      centScale: Long = 1024L,
                      seedIds: Option[Seq[Long]] = None): DataFrame = {
    val (_, cents) = lloyd(df, idCol, vecCol, k, rounds, quantScale,
      centScale, seedIds)
    val spark = df.sparkSession
    import spark.implicits._
    cents.toDF("cluster", "r").orderBy("cluster")
  }

  /** SERVE path — the clustering family's warm-start contract (the
    * q213/q221/q222/q227 stance): assign vectors to STORED centroids
    * without re-training. `centroids` is [[kmeansCentroids]]'s shape
    * (cluster, r); a duplicate cluster id RAISES (two centroids for one
    * label has no right answer), and by the exactness of the whole
    * chain, `kmeansAssign(kmeansCentroids(df, …), df) == kmeans(df, …)`
    * (spec-pinned). Output: (idCol, cluster, d2). The centroid table is
    * O(k·d) — collected to the driver and served as plan literals, the
    * same no-join scoring shape training uses. */
  def kmeansAssign(centroids: DataFrame, df: DataFrame, idCol: String,
                   vecCol: String, quantScale: Long = 1000L,
                   centScale: Long = 1024L): DataFrame = {
    Seq("cluster", "r").foreach(c => require(centroids.columns.contains(c),
      s"centroids must carry (cluster, r) — missing $c"))
    val rows = centroids.select(col("cluster").cast(LongType), col("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq
    require(rows.nonEmpty, "kmeansAssign: empty centroid table")
    require(rows.map(_._1).distinct.size == rows.size,
      s"kmeansAssign: duplicate cluster ids in the centroid table")
    require(rows.map(_._2.size).distinct.size == 1,
      "kmeansAssign: centroid vectors must share one dimensionality")
    requireD2Headroom(quantScale * centScale, rows.head._2.size)
    val points = df.select(col(idCol).as("__km_id"),
      quantize(col(vecCol), quantScale, 2.0).as("__km_q"))
    scoreAssign(points, rows, centScale)
      .select(col("__km_id").as(idCol), col("cluster"), col("d2"))
      .orderBy(idCol)
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023): cluster the
    * embeddings ([[kmeans]]), then drop every vector whose cosine
    * similarity to a SMALLER-id vector in the SAME cluster reaches
    * `minScore1e6` (the q54 score grid: `floor(1e6·cos)`), keeping the
    * earliest id — exact near-duplicate semantics with the pair work
    * bounded by cluster sizes instead of N², which is the entire point
    * of clustering first. Output: (idCol, cluster, dup_of NULLABLE) —
    * dup_of = the smallest same-cluster id it duplicates, NULL for
    * kept vectors.
    *
    * The clustering step bounds RECALL: a true near-duplicate pair
    * split across clusters is not examined (the documented SemDeDup
    * trade; raise k for tighter clusters and less pair work, lower it
    * for higher recall). Scale shape: pairs form per cluster via the
    * [[Similarity.cosinePairsBlocked]] equi-keyed self-join — never a
    * global cartesian. */
  /** INCREMENTAL semantic dedup — [[graft.text.Dedup.dedupDelta]]'s
    * contract for embeddings, completing the family's warm-start set
    * (q227 text / q231 components / q235 centroids / this): flag which
    * vectors of a NEW batch semantically duplicate an EXISTING corpus
    * using only the STORED artifacts — the corpus's (id, vec, cluster)
    * table and the centroid model — with corpus×corpus pairs never
    * re-examined and work bounded by |delta| × cluster sizes. A delta
    * vector is flagged iff its exact integer cosine (the q54 grid)
    * against a CORPUS clustermate or an EARLIER-id delta clustermate
    * reaches `minScore1e6`; dup_of = the smallest matching id.
    * Overlapping ids RAISE (the dedupDelta disjoint-sides contract).
    * Output: delta-only (idCol, cluster, dup_of NULLABLE), ordered.
    *
    * Same recall bound as [[semDedup]], sharpened: a near-duplicate
    * whose delta vector lands in a DIFFERENT cluster than its corpus
    * twin is not examined — at serving time that means the centroid
    * model must be the one the corpus was assigned under (stale models
    * degrade recall, never precision). */
  def semDedupDelta(corpus: DataFrame, delta: DataFrame,
                    centroids: DataFrame, idCol: String, vecCol: String,
                    minScore1e6: Long): DataFrame = {
    (Seq(idCol, vecCol, "cluster")).foreach(c =>
      require(corpus.columns.contains(c), s"corpus must carry $c"))
    Seq(idCol, vecCol).foreach(c =>
      require(delta.columns.contains(c), s"delta must carry $c"))
    val overlap = corpus.select(col(idCol)).distinct()
      .join(delta.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .limit(1).collect()
    require(overlap.isEmpty,
      s"semDedupDelta: id ${overlap.headOption.map(_.get(0)).orNull} appears " +
        "in BOTH corpus and delta — the sides must be disjoint")
    graft.functions.DotProductLong.register(corpus.sparkSession)
    val score =
      """CASE WHEN qn = 0 OR cn = 0 THEN NULL
        |ELSE CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |     / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) END"""
        .stripMargin
    val assigned = kmeansAssign(centroids, delta, idCol, vecCol)
      .select(col(idCol), col("cluster"))
    val dq = graft.operators.Checkpoints.checkpoint(
      delta.join(assigned, idCol)
        .select(col(idCol).as("id"), col("cluster"),
          Similarity.quantize(col(vecCol)).as("v"))
        .withColumn("nrm", expr("dot_long(v, v)")))
    val cq = corpus.select(col(idCol).as("id"), col("cluster"),
        Similarity.quantize(col(vecCol)).as("v"))
      .withColumn("nrm", expr("dot_long(v, v)"))
    def hits(other: DataFrame, extraPred: Column): DataFrame =
      dq.as("a").join(other.as("b"),
          col("a.cluster") === col("b.cluster") && extraPred)
        .select(col("a.id").as("id"), col("b.id").as("other"),
          expr("dot_long(a.v, b.v)").as("dot"),
          col("a.nrm").as("qn"), col("b.nrm").as("cn"))
        .filter(expr(score) >= minScore1e6)
        .select("id", "other")
    val dupOf = hits(cq, lit(true))
      .union(hits(dq, col("b.id") < col("a.id")))
      .groupBy("id").agg(min("other").as("dup_of"))
    assigned.select(col(idCol).as("id"), col("cluster"))
      .join(dupOf, Seq("id"), "left")
      .select(col("id").as(idCol), col("cluster"), col("dup_of"))
      .orderBy(idCol)
  }

  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
               rounds: Int, minScore1e6: Long): DataFrame = {
    val assignments = kmeans(df, idCol, vecCol, k, rounds)
      .select(col(idCol), col("cluster"))
    val blocked = df.select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .join(assignments.select(col(idCol).as("vec_id"), col("cluster")), "vec_id")
    val pairs = Similarity.cosinePairsBlocked(blocked, "cluster", minScore1e6)
    val dupOf = pairs.groupBy(col("vid_b").as("vec_id"))
      .agg(min("vid_a").as("dup_of"))
    assignments.select(col(idCol).as("vec_id"), col("cluster"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id").as(idCol), col("cluster"), col("dup_of"))
      .orderBy(idCol)
  }
}

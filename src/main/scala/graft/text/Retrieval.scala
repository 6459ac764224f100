package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Sparse lexical retrieval over the corpus: BM25-shaped top-k ranking of
  * documents for a (small) query set — the classic candidate-generation /
  * corpus-search primitive beside the embedding family in
  * [[graft.embed.Similarity]].
  *
  * Scoring is the BM25 form with every ratio integer-exact so a SQL oracle
  * reproduces it bit-for-bit (the repo-wide determinism contract):
  *
  *   idf1000(t)  = (1000 · (N − df)) div (df + 1)
  *   norm1000(d) = 1000 − b1000 + (b1000 · len(d) · 1000) div avg1000
  *   denom(t,d)  = tf·1000 + (k1_1000 · norm1000) div 1000
  *   s1000(t,d)  = (idf1000 · tf · (k1_1000 + 1000)) div denom
  *   score1000(q,d) = Σ_{t ∈ q} s1000(t, d)
  *
  * The idf is the log-free Robertson surrogate (N−df)/(df+1) — the same
  * df-monotonicity as ln((N−df+0.5)/(df+0.5)) without ln(), whose
  * last-ulp rounding differs between libm implementations and would break
  * hash-exact oracles. k1/b arrive in permille (defaults 1200/750 ≈ the
  * textbook k1=1.2, b=0.75). Int64 bounds: the widest product is
  * idf1000·tf·(k1+1000) ≤ 1000·N·tf·(k1+1000) — safe through ~1e9 docs
  * with tf ≤ 1e3 and default k1.
  *
  * Scale shape (100 TB): query terms are broadcast; the corpus scan
  * explodes tokens and drops every non-query term BEFORE anything wide, so
  * all downstream volume is proportional to query-term HITS, not the
  * corpus. Doc length rides along from the same scan (no second corpus
  * pass, no corpus-wide length join). tf aggregation partially combines
  * in-partition (a doc's tokens are co-located after the narrow explode);
  * df is an O(|dict|) aggregate joined back by broadcast. Top-k per query
  * uses the shared bounded-heap partial top-k
  * ([[graft.embed.Similarity.topkPerQuery]]) — at most k rows per
  * (query, partition) cross the final exchange, never the full hit list.
  *
  * Output: (q_id, rank, doc_id, score1000), rank 1..k by
  * (score1000 desc, doc_id) — a strict total order, partitioning-invariant.
  * Queries whose terms miss the corpus entirely yield no rows.
  *
  * Column-type contract: `q_id` is treated as a STRING key (any type is
  * cast to string up front — a Long-keyed query frame works, its ids
  * ranked by their decimal spelling); `doc_id` must be an integral column
  * (the bounded-heap partial top-k packs it losslessly into a Long),
  * enforced with a require rather than an opaque downstream cast error.
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1Permille: Long = 1200L, bPermille: Long = 750L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Permille >= 0 && bPermille >= 0 && bPermille <= 1000,
      s"need k1Permille >= 0 and bPermille in [0,1000], got $k1Permille/$bPermille")
    val docIdType = docs.schema("doc_id").dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(docIdType),
      s"bm25TopK needs an integral doc_id (heap contract), got $docIdType")
    import docs.sparkSession.implicits._

    // corpus stats: two scalars off one narrow pass (O(1) driver state).
    // Computed with the SAME floor-div an oracle uses: avg1000 is a plan
    // constant, so both engines fold identical integers.
    val lens = docs.select(
      size(split(coalesce(col("text"), lit("")), " ")).cast(LongType).as("len"))
    val (nDocs, totTok) = lens.agg(count(lit(1)), sum("len")).as[(Long, Long)].head()
    require(nDocs > 0, "bm25TopK needs a non-empty corpus")
    val avg1000 = 1000L * totTok / nDocs

    // queries are driver-provided and broadcast-sized by contract; the
    // string q_id -> dense long index is an O(|Q|) driver map (needed by
    // the Long-keyed partial-top-k heap), joined back at the end
    val qt = queries
      .select(col("q_id").cast(StringType).as("q_id"),
        explode(array_distinct(split(col("qtext"), " "))).as("term"))
    val qIds = qt.select("q_id").distinct().as[String].collect().sorted
    val qIdx = qIds.zipWithIndex.map { case (q, i) => (q, i.toLong) }
      .toSeq.toDF("q_id", "qn")
    val qtn = qt.join(broadcast(qIdx), Seq("q_id")).select("qn", "term")
    val dict = qtn.select("term").distinct()

    // ONE corpus scan: narrow explode with the doc length riding along;
    // non-query terms die before any exchange
    val matched = docs
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).cast(LongType).as("len"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
      .join(broadcast(dict), Seq("term"))
      .groupBy("doc_id", "term", "len")
      .agg(count(lit(1)).cast(LongType).as("tf"))

    val dft = matched.groupBy("term").agg(count(lit(1)).cast(LongType).as("df"))

    val scored = matched
      .join(broadcast(dft), Seq("term"))
      .join(broadcast(qtn), Seq("term"))
      .withColumn("idf1000", expr(s"(1000 * ($nDocs - df)) div (df + 1)"))
      .withColumn("norm1000",
        expr(s"1000 - $bPermille + (($bPermille * len * 1000) div $avg1000)"))
      .withColumn("denom",
        expr(s"tf * 1000 + (($k1Permille * norm1000) div 1000)"))
      .withColumn("s1000",
        expr(s"(idf1000 * tf * ($k1Permille + 1000)) div denom"))
      .groupBy("qn", "doc_id")
      .agg(sum("s1000").cast(LongType).as("score1000"))

    graft.embed.Similarity.topkPerQuery(
        scored.select(col("qn").as("q_id"), col("doc_id").as("cand_id"),
          col("score1000").as("score")), k)
      .select(col("q_id").as("qn"), col("rn").as("rank"),
        col("cand_id").as("doc_id"), col("score").as("score1000"))
      .join(broadcast(qIdx), Seq("qn"))
      .select("q_id", "rank", "doc_id", "score1000")
      .orderBy("q_id", "rank")
  }

  /** Reciprocal-rank fusion — merge rankings from heterogeneous retrievers
    * (BM25 × dense ANN, multiple query rewrites, per-shard lists) without
    * comparable scores: each run contributes `scale div (rrfK + rank)`
    * points per (query, doc), summed across runs (Cormack et al., SIGIR'09;
    * rrfK = 60 is the paper's constant). Integer division replaces the
    * paper's 1/(k+r) float so the fused score is EXACT and any engine
    * replays it; `scale` = 1e9 keeps three significant digits between
    * adjacent ranks out to rank ~1e6 while Int64 holds ≤ 9.2e9 runs/doc.
    *
    * Input `runs`: the UNION of the runs' (query, doc, rank) triples, rank
    * 1-based within each run (rank < 1 or NULL raises — a 0-based run
    * would silently dominate every fusion). Output: top-`k` per query —
    * (query, doc, rrf_score, fused_rank) under the caller's query/doc
    * column names, fused_rank 1..k by (rrf_score desc, doc) — a strict
    * total order, ordered by (query, fused_rank).
    *
    * Scale shape: one map-side-combined aggregation keyed (query, doc),
    * one query-partitioned window over the fused candidates (each doc
    * appears once per query after the groupBy — the window input is the
    * candidate set, never runs × docs), no collect, no broadcast. */
  def rrfFuse(runs: DataFrame, queryCol: String, docCol: String,
              rankCol: String, k: Int, rrfK: Int = 60,
              scale: Long = 1000000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(scale >= 1000, s"scale must be >= 1000, got $scale")
    require(Seq(queryCol, docCol, rankCol).distinct.size == 3,
      "query/doc/rank columns must be distinct")
    require(!Seq(queryCol, docCol).contains("rrf_score") &&
      !Seq(queryCol, docCol).contains("fused_rank"),
      "query/doc columns must not be named rrf_score/fused_rank")
    val rank = col(rankCol).cast(LongType)
    val pts = runs.select(col(queryCol), col(docCol),
      when(rank >= 1L, expr(s"$scale div ($rrfK + CAST(`$rankCol` AS BIGINT))"))
        .otherwise(raise_error(format_string(
          "rrfFuse: rank must be >= 1, got %s", col(rankCol))))
        .as("__pts"))
    val fused = pts.groupBy(col(queryCol), col(docCol))
      .agg(sum("__pts").as("rrf_score"))
    fused.withColumn("fused_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(queryCol))
          .orderBy(col("rrf_score").desc, col(docCol))))
      .filter(col("fused_rank") <= k)
      .orderBy(col(queryCol), col("fused_rank"))
  }
}

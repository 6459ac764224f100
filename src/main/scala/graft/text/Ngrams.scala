package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus n-gram statistics — the counting passes behind tokenizer / LM /
  * embedding training prep. All integer-exact and deterministic.
  *
  * Scale shape: one explode + one hash-aggregate per operator (map-side
  * partial aggregation collapses the token stream before the shuffle);
  * the skip-gram pair generation is a delta-exploded equi-join on
  * `(doc_id, position)` — linear in tokens × radius, never quadratic in
  * document length and never a corpus-level cross join.
  */
object Ngrams {

  /** Tokenizer-prep vocabulary: corpus token counts, frequency-ranked
    * (rank 1 = most frequent; ties break lexicographically), truncated to
    * tokens with count >= `minCount`. The rank is DISTRIBUTED
    * ([[graft.operators.GlobalRank]] — range shuffle + zipWithIndex), not
    * a partitionless row_number window, because a web corpus's vocabulary
    * is billions of distinct tokens. Output: (token, cnt, rank). */
  def vocab(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val counts = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    graft.operators.GlobalRank.withRank(counts, numParts = 0, "r",
        col("cnt").desc, col("token"))
      .select(col("token"), col("cnt"), (col("r") + 1).as("rank"))
      .orderBy("rank")
  }

  /** Zipf / vocabulary-shape profile — the corpus diagnostic behind
    * "does this crawl look like natural language": token frequencies
    * ranked, then collapsed into LOG-RANK buckets (bucket = ⌊log₂ rank⌋),
    * each with its token count and frequency mass. On Zipfian text the
    * per-bucket mass is near-flat; boilerplate-heavy or synthetic dumps
    * bend the curve. Exact integers throughout — floor(log₂) of an
    * integer rank is float-safe because a double error cannot cross an
    * integer boundary except AT an exact power of two, where log₂ is
    * exactly representable. Output: (bucket, n_tokens, sum_cnt, min_cnt,
    * max_cnt), ordered by bucket.
    *
    * Scale shape: rides [[vocab]]'s map-side-combined token count and
    * scalable GlobalRank; the bucket collapse is one aggregation over
    * the O(vocabulary) table. */
  def zipfProfile(docs: DataFrame, minCount: Long = 1L): DataFrame =
    vocab(docs, minCount)
      .withColumn("bucket", expr("CAST(floor(log2(rank)) AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"), sum("cnt").as("sum_cnt"),
        min("cnt").as("min_cnt"), max("cnt").as("max_cnt"))
      .orderBy("bucket")

  /** Bigram counts with the top `k` continuations per head word, ranked by
    * (count desc, word). Output: (w1, w2, cnt, rn). */
  def topBigrams(docs: DataFrame, k: Int): DataFrame = {
    val pairs = docs.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> struct(element_at(ws, i+1) AS w1, element_at(ws, i+2) AS w2))""".stripMargin))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    val w = Window.partitionBy("w1").orderBy(col("cnt").desc, col("w2"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= k)
      .orderBy("w1", "rn")
  }

  /** Per-document corpus-LM fluency score — the integer-exact, log-free
    * analogue of perplexity filtering (a standard training-data quality
    * signal): each bigram (w1, w2) scores its corpus conditional
    * `count(w1,w2)·1000 div count(w1·)` (0..1000), and a document scores
    * the integer mean over its bigrams. Repetitive/templated text scores
    * high, word-salad low. Docs with < 2 tokens have no bigrams and are
    * absent from the output. Output: (doc_id, n_bigrams, lm_score1000).
    *
    * Scale shape: two hash-aggregates build the model (map-side combined);
    * scoring joins the doc's bigram stream to the model on (w1, w2) — the
    * model tables broadcast while they fit, degrade to shuffled joins
    * beyond (`broadcastModel = false`). */
  def bigramScore(docs: DataFrame, broadcastModel: Boolean = true): DataFrame = {
    def hinted(df: DataFrame): DataFrame = if (broadcastModel) broadcast(df) else df
    val pairs = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> struct(element_at(ws, i+1) AS w1, element_at(ws, i+2) AS w2))""".stripMargin))
        .as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    // materialized: big feeds the head aggregation AND the scoring join —
    // uncheckpointed, each consumer re-executes the corpus-wide bigram
    // explode underneath it (the pairs stream itself stays lazy: it is
    // corpus-sized, and its two executions — the model build and the
    // scoring pass — are the irreducible ones)
    val big = graft.operators.Checkpoints.checkpoint(
      pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    // head counts derived from the BIGRAM table (sum of c12 per head), not
    // the token stream: w1 occurrences as a bigram head — so scores of a
    // head's continuations sum to <= 1000 exactly
    val head = big.groupBy("w1").agg(sum("c12").as("c1"))
    pairs
      .join(hinted(big), Seq("w1", "w2"))
      .join(hinted(head), Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("c12 * 1000 div c1")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("CAST(s div n_bigrams AS BIGINT)").as("lm_score1000"))
      .orderBy("doc_id")
  }

  /** Per-document top term by a tf/df score (integer surrogate for tf-idf:
    * `tf·10^6 div df` — log-free so it is cross-engine exact; document
    * frequency is the corpus-wide distinct-doc count per term).
    * Output: (doc_id, term, tf, df, score). */
  def topTermByTfDf(docs: DataFrame, broadcastDf: Boolean = true): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val df = tok.select("doc_id", "w").distinct()
      .groupBy("w").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w"))
    // broadcast() is a hint Spark obeys unconditionally — a web-corpus
    // vocabulary outgrows it; broadcastDf = false degrades to a shuffled
    // join, the same escape hatch bigramScore/jaccardPairs expose
    val hintedDf = if (broadcastDf) broadcast(df) else df
    tf.join(hintedDf, "w")
      .withColumn("score", expr("CAST(tf * 1000000 div df AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("w").as("term"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id")
  }

  /** Inverted-index postings: term → document frequency + the sorted
    * posting list (comma-joined doc ids — a string so it hash-compares
    * cross-engine). One distinct + one groupBy, both map-side-combining.
    *
    * Scale guard: posting lists are ELIDED (null) for terms with
    * df > maxDf — a web-corpus stopword's posting list is the corpus
    * itself, and no real index materializes it as one row (production
    * shards hot terms by (term, block); the df column is always exact). */
  def postings(docs: DataFrame, maxDf: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    tok.groupBy("w")
      .agg(count(lit(1)).as("df"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          x => x.cast("string")), ",").as("plist"))
      .select(col("w").as("term"), col("df"),
        when(col("df") <= maxDf, col("plist")).as("postings"))
      .orderBy("term")
  }

  /** Collocation mining — adjacent word pairs scored by exact PMI-style
    * lift `p(w1 w2) / (p(w1)·p(w2))`, kept as the integer fraction
    * lift_num / lift_den with lift_num = cnt_pair · n_tokens and
    * lift_den = cnt_w1 · cnt_w2 (log-free PMI: the LOG is monotone, so
    * ranking and thresholding on the fraction are ranking and
    * thresholding on PMI — the [[graft.operators.Association]] lift
    * convention applied to word adjacency). High lift = words that
    * co-occur far above chance ("new york"); raw-count ranking
    * ([[topBigrams]]) surfaces frequent pairs, this surfaces BOUND
    * pairs. Output: (w1, w2, cnt_pair, cnt_w1, cnt_w2, lift_num,
    * lift_den) for pairs with cnt_pair >= `minCount`, ordered by
    * (w1, w2).
    *
    * Scale shape: one bigram explode + one unigram explode, each
    * collapsed by map-side-combined aggregation BEFORE any join; the two
    * unigram-count joins are keyed on the word (broadcast while the
    * vocabulary fits, shuffled hash past it — never data × data). The
    * n_tokens total is an O(1) driver scalar. Int64 guard: cnt_pair ·
    * n_tokens raises past Long.Max (the frequentPairs overflow
    * discipline) — reached only beyond ~3e9 tokens with a ~3e9-count
    * pair, where unit rescaling applies. */
  def collocations(docs: DataFrame, minCount: Long = 2L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val uni = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    // O(1) scalar collect (bounded driver state, the resample class)
    val nRow = uni.agg(sum("cnt")).head
    val nTokens = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    val pairs = docs.select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> struct(element_at(ws, i+1) AS w1, element_at(ws, i+2) AS w2))""".stripMargin))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt_pair"))
      .filter(col("cnt_pair") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("cnt").as("cnt_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cnt").as("cnt_w2")), Seq("w2"))
      .withColumn("lift_num", when(
        col("cnt_pair") > lit(if (nTokens == 0L) Long.MaxValue
          else Long.MaxValue / math.max(nTokens, 1L)),
        raise_error(lit(s"collocations: cnt_pair * $nTokens tokens " +
          "overflows Int64 — rescale units")))
        .otherwise(col("cnt_pair") * lit(nTokens)))
      .withColumn("lift_den", when(
        col("cnt_w1") > expr(s"${Long.MaxValue}L div greatest(cnt_w2, 1L)"),
        raise_error(lit("collocations: cnt_w1 * cnt_w2 overflows Int64 " +
          "— rescale units")))
        .otherwise(col("cnt_w1") * col("cnt_w2")))
      .select("w1", "w2", "cnt_pair", "cnt_w1", "cnt_w2",
        "lift_num", "lift_den")
      .orderBy("w1", "w2")
  }

  /** Skip-gram (center, context) pair counts within ± `radius` positions —
    * word2vec-style training pairs. Output: top `k` pairs by
    * (cnt desc, w1, w2).
    *
    * Join shape: the context side is DELTA-EXPLODED (each token emits 2r
    * copies keyed by the center position it serves, `pos + δ` for
    * δ ∈ [-r, r] \ {0}) and the join is a pure equi-join on
    * `(doc_id, pos)` — linear in tokens × 2r. Joining on doc_id alone with
    * the radius as a post-join filter builds O(len²) intermediate pairs
    * per doc first (a 100k-token doc → 10¹⁰ rows before the filter). */
  def skipgramPairs(docs: DataFrame, radius: Int, k: Int): DataFrame = {
    require(radius >= 1, "radius must be >= 1")
    val pos = graft.text.TextOps.spreadScan(docs)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
    val deltas = ((-radius to -1) ++ (1 to radius)).mkString(",")
    // context token at position p serves centers p+δ ⇒ emit (doc_id, p+δ, w)
    val ctx = pos.select(col("doc_id"),
        explode(expr(s"transform(array($deltas), d -> pos + d)")).as("pos"),
        col("w"))
    pos.as("a").join(ctx.as("b"), Seq("doc_id", "pos"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2"))
      .limit(k)
  }
}

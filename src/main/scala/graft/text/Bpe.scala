package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Subword (BPE-style) tokenization over the checked-in demo vocabulary —
  * the deterministic greedy longest-match apply of
  * [[graft.functions.BpeTokens]], packaged for the pipeline operators.
  *
  * Why it exists: every real training pipeline budgets SUBWORD tokens
  * (what the model consumes), not whitespace words — chunk boundaries,
  * packing capacity, and mixture budgets all shift once a tokenizer is
  * applied. The vocabulary here is a checked-in constant (like a released
  * tokenizer's merges file): deterministic, versioned with the code, and
  * replayable in the DuckDB oracle (gate q66 re-derives the same token
  * stream via a recursive CTE).
  *
  * The vocab is ORDER-INSENSITIVE by construction — greedy longest-match
  * depends only on set membership, not merge priority — so there is no
  * hidden rank file to drift out of sync.
  */
object Bpe {

  /** Checked-in demo vocabulary: common English digraphs plus the corpus
    * domain words and their prefixes (so real merges happen at every
    * length). Single characters are implicit — the OOV fallback emits
    * them — and whitespace never appears (enforced by the expression). */
  val vocab: Seq[String] = Seq(
    // frequent English digraphs/trigraphs
    "th", "he", "in", "er", "an", "re", "on", "at", "or", "ar", "st",
    "en", "ed", "it", "ou", "ow", "al", "le", "ta", "ue", "ry", "ine",
    "the", "ing", "ter", "and",
    // corpus domain words + productive prefixes
    "scan", "sort", "table", "merge", "mer", "part", "window", "win",
    "small", "hash", "ha", "join", "jo", "batch", "bat", "stream", "str",
    "spark", "sp", "group", "gr", "query", "que", "row", "ro", "data",
    "da", "slow", "sl", "filter", "fil", "customer", "cust", "line", "li",
    "value", "val", "agg", "ag", "big", "bi", "column", "col", "co",
    "vector", "vec", "fast", "fa", "key", "ke", "order", "ord")

  /** The vocab as a SQL array literal — same text for Spark and DuckDB. */
  def vocabSql: String = vocab.map(t => s"'$t'").mkString("array(", ", ", ")")

  /** `array<string>` of subword tokens of `textCol`. Callers must have
    * [[graft.functions.BpeTokens.register]]ed the session (the operators
    * below do). */
  def tokensExpr(textCol: String): String = s"bpe_tokens($textCol, $vocabSql)"

  /** BIGINT subword-token count of `textCol` — the drop-in replacement
    * for the whitespace `size(split(text, ' '))` sizing in
    * [[Pipeline.mixture]]/[[Pipeline.pack]]. */
  def countTokens(textCol: String): Column =
    expr(s"size(${tokensExpr(textCol)})").cast(LongType)

  /** Distributed BPE merge LEARNING — vocabulary induction from the
    * corpus, the offline step that produces what [[vocab]] hard-codes.
    * Classic merge loop: start from single characters, repeatedly count
    * adjacent symbol pairs (weighted by word frequency) and merge the
    * most frequent pair, ties broken lexicographically — fully
    * deterministic, no RNG.
    *
    * Scale shape: the corpus first compresses to its DICTIONARY
    * (`groupBy word → count`, one shuffle over the corpus); every merge
    * round then runs over |dictionary| rows, not |corpus| — at web scale
    * that is millions of short arrays per round, a narrow map plus one
    * small pair-count shuffle with a driver-side O(1) top-1 collect
    * ([[org.apache.spark.sql.functions.aggregate]] HOF does the in-word
    * merge, so rounds never leave the executors). Rounds are inherently
    * sequential (each merge depends on the last); per-round results are
    * checkpointed and the superseded round released immediately
    * ([[graft.operators.Checkpoints]]).
    *
    * Returns the merged token strings in merge order. Apply them as the
    * closed vocabulary of [[graft.functions.BpeTokens]] (greedy
    * longest-match apply — WordPiece-style; merge-priority apply would
    * need a rank file, and greedy over the same vocabulary is the
    * deterministic, oracle-replayable choice this library makes).
    *
    * @param minPairCount stop early when the best pair drops below this
    *                     (the long tail of singleton pairs is noise) */
  def learn(docs: DataFrame, numMerges: Int, minPairCount: Long = 2L): Seq[String] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    import graft.operators.Checkpoints
    val chars = expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    var words = Checkpoints.checkpoint(
      docs.select(explode(split(col("text"), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(chars.as("syms"), col("cnt")))
    // sequence(1, 0) counts DOWN in Spark — single-symbol words must map
    // to an empty pair list, not a reversed range
    val pairs = expr(
      """CASE WHEN size(syms) >= 2 THEN
        |  transform(sequence(1, size(syms) - 1),
        |    i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))
        |ELSE array() END""".stripMargin)
    val merges = Seq.newBuilder[String]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = words
        .select(explode(pairs).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
      else {
        val (pa, pb) = (top(0).getString(0), top(0).getString(1))
        merges += pa + pb
        // left-to-right non-overlapping merge of (pa, pb) runs — the fold
        // never treats a just-merged token as a fresh pa (standard BPE)
        // CASE branches evaluate lazily — the empty-acc arm must come
        // first, because element_at(acc, -1) on an empty array throws
        // under ANSI and && does not short-circuit
        val merged = aggregate(col("syms"),
          array().cast("array<string>"),
          (acc, s) =>
            when(size(acc) === 0, array(s))
            .when(element_at(acc, -1) === lit(pa) && s === lit(pb),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(pa + pb))))
            .otherwise(concat(acc, array(s))))
        val prev = words
        words = Checkpoints.checkpoint(words.select(merged.as("syms"), col("cnt")))
        Checkpoints.release(prev)
      }
      round += 1
    }
    Checkpoints.release(words)
    merges.result()
  }

  /** (doc_id, n_bpe, bpe_text): per-document subword count and the
    * space-joined token stream (string, so it hash-compares cross-engine
    * without array-ordering ambiguity). One narrow pass. */
  def tokenize(docs: DataFrame): DataFrame = {
    graft.functions.BpeTokens.register(docs.sparkSession)
    docs.select(col("doc_id"),
        expr(tokensExpr("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast(LongType).as("n_bpe"),
        array_join(col("toks"), " ").as("bpe_text"))
      .orderBy("doc_id")
  }
}

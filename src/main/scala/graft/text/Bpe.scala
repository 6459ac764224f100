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

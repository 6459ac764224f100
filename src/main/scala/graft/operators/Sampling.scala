package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.text.TextOps

/** Deterministic hash-Bernoulli sampling: a row is kept iff
  * `xhash(key) mod den < num` — membership is a pure function of the row's
  * key, so the sample is reproducible across engines, runs, task retries,
  * and cluster sizes (a seeded-RNG `.sample()` is none of those: Spark's
  * Bernoulli sampler is seeded per-partition, so a repartition or
  * speculative re-execution draws a different sample).
  *
  * This is the same splitter-friendly sampling contract as the reference's
  * `my.threshold` flag (uw-mapreduce `SamplerMapper`, reimplemented at
  * `SlidingAggregate.scalable`); here it is exposed as a standalone,
  * oracle-checkable operator. Narrow (a filter — no shuffle, fully
  * pushdown-friendly), and rows sharing a key travel together — pick the
  * key at the granularity the downstream consumer needs (a unique row key
  * for row sampling; a document/user key for leakage-free dataset splits,
  * same idea as `Pipeline.splitByHash`).
  */
object Sampling {

  /** Keeps rows whose deterministic key hash lands below num/den.
    * `keyCols` are concatenated with a  separator (a character that
    * cannot appear in the decimal renderings of numeric keys) so composite
    * keys can't alias ("1","23" vs "12","3"). */
  def byKeyHash(df: DataFrame, keyCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(den >= 1, "den must be >= 1")
    require(num >= 0 && num <= den, "need 0 <= num <= den")
    val key = concat_ws("", keyCols.map(c => col(c).cast(StringType)): _*)
    // xhash is non-negative (60-bit), so plain % is already a positive mod
    df.filter(TextOps.xhash(key) % den < num)
  }

  /** The complement sample — byKeyHash keeps hash < num/den, this keeps the
    * rest; together they partition the input exactly. */
  def byKeyHashComplement(df: DataFrame, keyCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(den >= 1, "den must be >= 1")
    require(num >= 0 && num <= den, "need 0 <= num <= den")
    val key = concat_ws("", keyCols.map(c => col(c).cast(StringType)): _*)
    df.filter(TextOps.xhash(key) % den >= num)
  }
}

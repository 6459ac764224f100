package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitAndCount, BitmapFromRanks, BpeTokens, CharNGrams, DotProductLong, MinhashAffine, SortedIntersectCount, WordNgrams}

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`:
  * injects the native codegen'd functions into every session built with
  * the extension, so pure-SQL workloads (thriftserver, spark-sql, notebook
  * sessions) get `dot_long` / `sorted_intersect_count` without calling any
  * Scala API first. The DataFrame operators also self-register the SCALAR
  * functions per-session (idempotently), so for those either path works
  * alone; the table-valued operator surface ([[GraftTableFunctions]]) is
  * injectable only here — a session built without the extension has the
  * Scala API but no `graft_*` TVFs.
  *
  * This is the standard third-party packaging seam — the same hook a
  * custom Rule[LogicalPlan] or SparkStrategy would use; scalar functions
  * plus the [[GraftTableFunctions]] table-valued operator surface are all
  * this library needs to inject because every whole-operator shape is
  * expressible in stock Catalyst plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // table-valued operator surface: SELECT * FROM graft_sliding_agg(...)
    GraftTableFunctions.descriptions.foreach(ext.injectTableFunction)
    // the companion builders are arity-checked — a wrong argument count
    // fails with the function name, not an IndexOutOfBoundsException
    ext.injectFunction((FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      (exprs: Seq[Expression]) => DotProductLong.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("bit_and_count"),
      new ExpressionInfo(classOf[BitAndCount].getName, "bit_and_count"),
      (exprs: Seq[Expression]) => BitAndCount.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("bitmap_from_ranks"),
      new ExpressionInfo(classOf[BitmapFromRanks].getName, "bitmap_from_ranks"),
      (exprs: Seq[Expression]) => BitmapFromRanks.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => CharNGrams.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("minhash_affine"),
      new ExpressionInfo(classOf[MinhashAffine].getName, "minhash_affine"),
      (exprs: Seq[Expression]) => MinhashAffine.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "bpe_tokens"),
      (exprs: Seq[Expression]) => BpeTokens.builder(exprs)))
    ext.injectFunction((FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams.builder(exprs)))
    // bloom semi-join surface: sketch an arbitrary key column, probe it as
    // a scalar predicate (both sides hash with the same xxhash64 inside)
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(graft.operators.BloomJoin.getClass.getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) => graft.operators.BloomJoin.aggBuilder(exprs)))
    ext.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(graft.operators.BloomJoin.getClass.getName, "graft_bloom_contains"),
      (exprs: Seq[Expression]) => graft.operators.BloomJoin.containsBuilder(exprs)))
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: deterministic greedy longest-match subword
  * tokenization (`bpe_tokens(text, vocab)`) — the WordPiece/BPE-apply
  * step a training pipeline sizes documents with. Words are maximal runs
  * of non-ASCII-whitespace; within a word, the longest vocab entry
  * matching at the cursor is emitted (ties impossible — equal-length
  * matches of the same prefix are the same string), with the single
  * character as the out-of-vocabulary fallback, so every input character
  * is covered and the token stream is unique for a given (text, vocab).
  * No merge-order state: greedy longest-match over a closed vocabulary is
  * reproducible cross-engine, which makes it DuckDB-oracle-checkable
  * (replayed as a recursive CTE, gate q66).
  *
  * Unicode contract: positions count CODE POINTS (like SQL `substring`);
  * matching is exact UTF-8 byte equality on zero-copy slices, one
  * boundary scan per row (same mechanics as [[CharNGrams]]). Word
  * boundaries are the ASCII whitespace bytes (space, \t, \n, \r, \f, \u000B) — multi-byte whitespace is treated as ordinary text, so the
  * contract stays byte-decidable. NULL text yields an empty array (the
  * count-of-tokens consumers treat NULL as zero tokens), so the
  * expression itself is never NULL.
  *
  * Why native: the HOF spelling needs a per-position lambda over a
  * per-length inner loop — O(|text|·maxTokenLen) interpreted dispatches;
  * this is one tight loop with hash probes inside whole-stage codegen.
  */
case class BpeTokens(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  require(vocab.nonEmpty, "bpe_tokens: vocab must be non-empty")

  @transient private lazy val matcher = BpeTokens.buildMatcher(vocab)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => new GenericArrayData(Array.empty[Any])
      case s => BpeTokens.encode(s.asInstanceOf[UTF8String], matcher)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = BpeTokens.getClass.getName.stripSuffix("$")
    val matcherRef = ctx.addReferenceObj("bpeMatcher", matcher,
      classOf[BpeTokens.Matcher].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          ${childGen.isNull}
            ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0])
            : $cls.encode(${childGen.value}, $matcherRef);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {
  /** Closed-vocabulary matcher: byte-hashed token set + the longest token
    * length in code points (bounds the greedy probe). Built once per
    * expression instance, shipped to codegen as a reference object. */
  final class Matcher(val tokens: java.util.HashSet[UTF8String], val maxLen: Int)
    extends Serializable

  def buildMatcher(vocab: Seq[String]): Matcher = {
    val set = new java.util.HashSet[UTF8String](vocab.size * 2)
    var maxLen = 1
    vocab.foreach { t =>
      require(t.nonEmpty, "bpe_tokens: vocab entries must be non-empty")
      require(!t.exists(c => c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
        c == '\f' || c == '\u000B'), s"bpe_tokens: vocab entry '$t' contains whitespace")
      val u = UTF8String.fromString(t)
      set.add(u)
      maxLen = math.max(maxLen, u.numChars())
    }
    new Matcher(set, maxLen)
  }

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** One boundary scan, then a greedy longest-match walk emitting
    * zero-copy byte slices. O(|text|·maxLen) hash probes worst case. */
  def encode(s: UTF8String, m: Matcher): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nb
    val out = new java.util.ArrayList[Any](math.max(8, c / 2))
    var pos = 0
    while (pos < c) {
      val b0 = bytes(offs(pos))
      if (isAsciiWs(b0)) pos += 1
      else {
        // word end: next ASCII-whitespace char (or end of text)
        var we = pos + 1
        while (we < c && !isAsciiWs(bytes(offs(we)))) we += 1
        while (pos < we) {
          var take = 1 // OOV fallback: the single character itself
          var len = math.min(m.maxLen, we - pos)
          while (len >= 2 && take == 1) {
            if (m.tokens.contains(
              UTF8String.fromBytes(bytes, offs(pos), offs(pos + len) - offs(pos))))
              take = len
            len -= 1
          }
          out.add(UTF8String.fromBytes(bytes, offs(pos), offs(pos + take) - offs(pos)))
          pos += take
        }
      }
    }
    new GenericArrayData(out.toArray)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bpe_tokens expects exactly 2 arguments (text, vocab), got ${exprs.length}")
    val vocabExpr = exprs(1)
    require(vocabExpr.foldable && vocabExpr.dataType.isInstanceOf[ArrayType] &&
      vocabExpr.dataType.asInstanceOf[ArrayType].elementType == StringType,
      s"bpe_tokens: vocab must be a foldable array<string>, got ${vocabExpr.sql}")
    val vocab = vocabExpr.eval(null).asInstanceOf[ArrayData]
      .toArray[UTF8String](StringType).map { u =>
        require(u != null, "bpe_tokens: vocab entries must not be NULL")
        u.toString
      }.toSeq
    BpeTokens(exprs.head, vocab)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_tokens")))
      reg.createOrReplaceTempFunction("bpe_tokens", builder, "built-in")
  }
}

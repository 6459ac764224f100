package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL word n-grams of a single-space-
  * tokenized string, duplicates kept, in document order — semantically
  * identical to [[graft.text.TextOps.wordNgrams]]'s HOF form
  * (`transform(sequence(0, size(ws) - n), i -> array_join(slice(ws, i+1,
  * n), ' '))`, spec-gated parity) but one pass per row instead of
  * ~|tokens| interpreted lambda dispatches each allocating a slice array
  * and a joined string. Same lesson as [[MinhashAffine]]/[[CharNGrams]]:
  * the interpreted HOF tokenize stage dominates the n-gram hygiene
  * operators (q69/q70) at corpus scale.
  *
  * Tokenization contract matches `split(text, ' ')` exactly: split on
  * EVERY single space, empty tokens (consecutive/leading/trailing spaces)
  * kept. Because the separator is the single byte 0x20 — which can never
  * occur inside a multi-byte UTF-8 sequence — token boundaries are found
  * in one byte scan, and each gram is a ZERO-COPY slice of the row's
  * UTF-8 bytes (the gram's interior separators are the original spaces,
  * so the slice IS the joined string). Under n tokens yields an empty
  * array; so does NULL (the HOF's `when(...).otherwise(array())` routes
  * a NULL condition to ELSE), so the expression never null-propagates. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => WordNgrams.emptyGrams()
      case s => WordNgrams.grams(s.asInstanceOf[UTF8String], n)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = WordNgrams.getClass.getName.stripSuffix("$")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          ${childGen.isNull} ? $cls.emptyGrams() : $cls.grams(${childGen.value}, $n);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  /** The NULL-input result (fresh per call — ArrayData is mutable-ish and
    * a shared singleton could be captured by an unsafe projection). */
  def emptyGrams(): GenericArrayData = new GenericArrayData(Array.empty[Any])

  /** One byte scan for token-start offsets, then zero-copy gram slices:
    * gram i spans bytes [start(i), start(i+n) - 1) — everything up to the
    * space (or end) that closes token i+n-1. */
  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // token j starts at starts(j); sentinel starts(tokens) = nb + 1 so
    // "start of the token after the last" - 1 = nb = end of string
    var tokens = 1
    var i = 0
    while (i < nb) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    if (tokens < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](tokens + 1)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = nb + 1
    val out = new Array[Any](tokens - n + 1)
    var g = 0
    while (g + n <= tokens) {
      out(g) = UTF8String.fromBytes(bytes, starts(g), starts(g + n) - 1 - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"word_ngrams expects exactly 2 arguments (text, n), got ${exprs.length}")
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"word_ngrams: n must be an integer literal, got ${other.sql}")
    }
    WordNgrams(exprs.head, n)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams")))
      reg.createOrReplaceTempFunction("word_ngrams", builder, "built-in")
  }
}

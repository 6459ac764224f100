package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT character n-grams of a string,
  * in first-occurrence order — semantically identical to
  * `array_distinct(transform(sequence(1, length(s) - n + 1), i ->
  * substring(s, i, n)))` ([[graft.text.TextOps.charGrams3]], spec-gated
  * parity), but one pass per row instead of ~|s| interpreted lambda
  * dispatches plus |s| O(|s|) substring seeks. Measured as the dominant
  * cost of the char-gram Jaccard join's tokenize stage.
  *
  * Unicode contract matches SQL `substring`: positions count CODE POINTS,
  * not bytes — the byte offset of every character boundary is collected in
  * one forward scan, and each gram is a zero-copy slice of the row's UTF-8
  * bytes. Strings shorter than n characters yield an empty array — and so
  * does a NULL string, because that is what the HOF's
  * `CASE WHEN length(text) >= 3 ... ELSE array() END` yields (a NULL
  * condition falls to ELSE); the parity claim covers NULL rows too, so
  * this expression does NOT null-propagate and is never null itself.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => CharNGrams.emptyGrams()
      case s => CharNGrams.distinctGrams(s.asInstanceOf[UTF8String], n)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cls = CharNGrams.getClass.getName.stripSuffix("$")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          ${childGen.isNull} ? $cls.emptyGrams() : $cls.distinctGrams(${childGen.value}, $n);
        """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGrams {
  /** The NULL-input result (fresh per call — ArrayData is mutable-ish and
    * a shared singleton could be captured by an unsafe projection). */
  def emptyGrams(): GenericArrayData = new GenericArrayData(Array.empty[Any])

  /** One forward pass: char-boundary byte offsets, then zero-copy gram
    * slices deduped through a LinkedHashSet (UTF8String hashes by bytes). */
  def distinctGrams(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes // materializes once; all grams slice this array
    val nb = bytes.length
    // offsets of each character start, plus the end sentinel
    val offs = new Array[Int](s.numChars() + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = nb
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(c, 1024))
    var g = 0
    while (g + n <= c) {
      seen.add(UTF8String.fromBytes(bytes, offs(g), offs(g + n) - offs(g)))
      g += 1
    }
    new GenericArrayData(seen.toArray)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"char_ngrams expects exactly 2 arguments (text, n), got ${exprs.length}")
    val n = exprs(1) match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"char_ngrams: n must be an integer literal, got ${other.sql}")
    }
    CharNGrams(exprs.head, n)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("char_ngrams")))
      reg.createOrReplaceTempFunction("char_ngrams", builder, "built-in")
  }
}

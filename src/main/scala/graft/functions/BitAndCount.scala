package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: popcount of the bitwise AND of two
  * `array<bigint>` bitmaps — the set-intersection kernel of the
  * small-universe Jaccard join ([[graft.text.Dedup.jaccardPairsBitmap]]):
  * sets over a universe of U elements are ⌈U/64⌉-long bitmaps, and
  * |A ∩ B| is one AND+POPCNT pass.
  *
  * Same "custom Expression with doGenCode beats a UDF" rationale as
  * [[DotProductLong]]: a tight primitive loop (Long.bitCount JITs to the
  * POPCNT instruction) inside whole-stage codegen, no boxing, no
  * per-element lambda dispatch. Also reusable as a Hamming-weight kernel
  * (xor in the caller, and with an all-ones mask here).
  */
case class BitAndCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_and_count"

  // ExpectsInputTypes is off the table for third-party expressions
  // (AbstractDataType is private[sql] in Spark 4), but checkInputDataTypes
  // is public API — without it a wrong-typed SQL call (e.g. int arrays)
  // would reach the unsafe getters and return garbage, not an error
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitAndCount {
  /** Arity-checked builder shared by register() and [[graft.GraftExtensions]]
    * — a wrong argument count must fail with the function name and expected
    * arity, not an IndexOutOfBoundsException from exprs(1). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"bit_and_count expects exactly 2 arguments, got ${exprs.length}")
    BitAndCount(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bit_and_count")))
      reg.createOrReplaceTempFunction("bit_and_count",
        builder, "built-in")
  }
}

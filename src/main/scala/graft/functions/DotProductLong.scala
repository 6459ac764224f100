package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: dot product of two `array<bigint>` columns.
  *
  * This is the "custom Expression with doGenCode beats a UDF" path: the
  * generated code is a tight primitive loop over Tungsten `ArrayData` —
  * no boxing, no lambda dispatch per element (the higher-order
  * `aggregate(zip_with(...))` form evaluates interpreted lambda closures
  * per element), and it composes inside whole-stage codegen.
  *
  * Arithmetic is raw 64-bit (wrapping) — callers quantize inputs so
  * |x·y·dim| << 2^63 (see [[graft.embed.Similarity]]'s contract), matching
  * the exact-integer semantics the oracles check.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

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
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
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
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductLong {
  /** Arity-checked builder shared by register() and [[graft.GraftExtensions]]
    * — a wrong argument count must fail with the function name and expected
    * arity, not an IndexOutOfBoundsException from exprs(1). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"dot_long expects exactly 2 arguments, got ${exprs.length}")
    DotProductLong(exprs(0), exprs(1))
  }

  /** Registers `dot_long(a, b)` as a temp SQL function on the session.
    * Truly idempotent: re-registering an existing function would log a
    * "replaced a previously registered function" warning per call site —
    * pure log noise on hot paths that register defensively. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dot_long")))
      reg.createOrReplaceTempFunction("dot_long",
        builder, "built-in")
  }
}

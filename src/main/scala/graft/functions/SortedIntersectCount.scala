package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |a ∩ b| for two SORTED `array<int>` columns
  * via a two-pointer merge — O(|a|+|b|), zero allocation.
  *
  * The built-in `size(array_intersect(a, b))` builds a hash set AND
  * materializes the intersection array per row; on a similarity join
  * verifying millions of candidate pairs that allocation dominates. Inputs
  * MUST be sorted ascending (the set-similarity operators sort once per
  * document up front) and duplicate-free.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  // ExpectsInputTypes is off the table for third-party expressions
  // (AbstractDataType is private[sql] in Spark 4), but checkInputDataTypes
  // is public API — without it a wrong-typed SQL call (e.g. int arrays)
  // would reach the unsafe getters and return garbage, not an error
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var cnt = 0L
    while (i < nx && j < ny) {
      val xv = x.getInt(i); val yv = y.getInt(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $xv = $a.getInt($i); int $yv = $b.getInt($j);
         |  if ($xv == $yv) { $cnt++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Arity-checked builder shared by register() and [[graft.GraftExtensions]]
    * — a wrong argument count must fail with the function name and expected
    * arity, not an IndexOutOfBoundsException from exprs(1). */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"sorted_intersect_count expects exactly 2 arguments, got ${exprs.length}")
    SortedIntersectCount(exprs(0), exprs(1))
  }

  /** Registers `sorted_intersect_count(a, b)` on the session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    // idempotent without the "replaced a previously registered function"
    // warning createOrReplace logs on every defensive re-register
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count")))
      reg.createOrReplaceTempFunction("sorted_intersect_count",
        builder, "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native sketch-read expressions (r15 optimization round, guide §4 /
  * the [[JlProjectLong]] precedent): the sketch families' dense-vector
  * reads were higher-order `aggregate(...)` calls — `CodegenFallback`,
  * so every element costs an interpreted lambda dispatch — and the
  * quantile walk additionally referenced the (itself O(bins)) total
  * INSIDE its per-element lambda, making one read O(bins²) interpreted
  * per row: measured 2.3 s in one task for q219's 3-read snapshot scan.
  * These are single tight codegen passes, bit-identical results. */

/** Σ over an ARRAY<BIGINT> (NULL elements raise — the sketch vectors
  * are containsNull=false by construction, loud beats silent). ANSI
  * addition semantics preserved via Math.addExact. */
case class LongArraySum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null element at $i")
      s = Math.addExact(s, xs.getLong(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |long $s = 0L;
         |int $n = $xs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: null element at " + $i);
         |  }
         |  $s = java.lang.Math.addExact($s, $xs.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongArraySum =
    copy(child = newChild)
}

/** The quantile walk of [[graft.operators.QuantileSketch.quantileLower]]
  * as one pass: the first slot index where cum·den ≥ total·num
  * (cross-multiplied — no division), −1 for an all-zero sketch. The
  * Int64 guard (total ≤ Long.Max / den) raises with the operator's
  * exact message before any cross-multiply can overflow. */
case class SketchQuantileSlot(child: Expression, num: Int, den: Int)
  extends UnaryExpression {

  require(den >= 1 && num >= 1 && num <= den,
    s"quantile num/den must satisfy 1 <= num <= den, got $num/$den")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sketch_quantile_slot"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  private val lim = Long.MaxValue / den

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    var total = 0L
    var i = 0
    val n = xs.numElements()
    while (i < n) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null element at $i")
      total = Math.addExact(total, xs.getLong(i))
      i += 1
    }
    if (total > lim)
      throw new IllegalArgumentException(
        s"quantileLower: sketch total $total × den $den overflows Int64 " +
          s"(limit $lim) — rescale weights or lower den")
    if (total == 0L) -1
    else {
      val target = total * num
      var cum = 0L
      var pos = 0
      var ans = -1
      while (pos < n && ans < 0) {
        cum += xs.getLong(pos)
        if (cum * den >= target) ans = pos
        pos += 1
      }
      ans
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val total = ctx.freshName("total")
      val cum = ctx.freshName("cum")
      val pos = ctx.freshName("pos")
      val ans = ctx.freshName("ans")
      val target = ctx.freshName("target")
      s"""
         |long $total = 0L;
         |int $n = $xs.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($xs.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: null element at " + $i);
         |  }
         |  $total = java.lang.Math.addExact($total, $xs.getLong($i));
         |}
         |if ($total > ${lim}L) {
         |  throw new IllegalArgumentException(
         |    "quantileLower: sketch total " + $total + " × den $den overflows " +
         |    "Int64 (limit ${lim}) — rescale weights or lower den");
         |}
         |int $ans = -1;
         |if ($total > 0L) {
         |  long $target = $total * ${num}L;
         |  long $cum = 0L;
         |  int $pos = 0;
         |  while ($pos < $n && $ans < 0) {
         |    $cum += $xs.getLong($pos);
         |    if ($cum * ${den}L >= $target) $ans = $pos;
         |    $pos++;
         |  }
         |}
         |${ev.value} = $ans;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SketchQuantileSlot =
    copy(child = newChild)
}

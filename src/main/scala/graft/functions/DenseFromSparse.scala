package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Native Catalyst expression: densify one group's sparse sketch entries
  * — `array<struct<slot BIGINT, c BIGINT>>` (the `collect_list` of a
  * sparse (slot, count) aggregation) → the dense `ARRAY<BIGINT>` of
  * length `total` every portable-sketch read consumes, absent slots 0.
  *
  * Why an Expression and not composition (the r15 optimization round,
  * guide §4 / the [[JlProjectLong]] precedent): the compositional form —
  * `map_from_entries(collect_list(...))` read back by
  * `transform(sequence(0, total−1), i -> element_at(map, i))` — does one
  * `element_at` per dense slot, and Spark's `ArrayBasedMapData` lookup
  * is a LINEAR scan, so each row costs O(total × nnz) comparisons
  * (measured: the q219 snapshot read spent 1.8 s in ONE AQE-coalesced
  * task, ~425M map probes for 20k users × 102 slots). This loop is one
  * pass, O(total + nnz) per row, fully codegen.
  *
  * Semantics preserved exactly: duplicate slots RAISE (the map path's
  * `DUPLICATED_MAP_KEY` stance), out-of-range slots are ignored (the
  * transform read only probed 0..total−1), NULL entries/fields RAISE
  * (they cannot occur by construction; loud beats silent). */
case class DenseFromSparse(child: Expression, total: Int)
  extends UnaryExpression {

  require(total >= 1, s"total must be >= 1, got $total")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dense_from_sparse"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
      if st.length == 2 && st(0).dataType == LongType &&
        st(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val entries = v.asInstanceOf[ArrayData]
    val acc = new Array[Long](total)
    val seen = new Array[Boolean](total)
    var i = 0
    val n = entries.numElements()
    while (i < n) {
      if (entries.isNullAt(i))
        throw new IllegalArgumentException(s"$prettyName: null entry at $i")
      val e = entries.getStruct(i, 2)
      if (e.isNullAt(0) || e.isNullAt(1))
        throw new IllegalArgumentException(
          s"$prettyName: null slot or count at entry $i")
      val slot = e.getLong(0)
      if (slot >= 0L && slot < total) {
        val s = slot.toInt
        if (seen(s))
          throw new IllegalArgumentException(
            s"$prettyName: duplicate slot $s")
        seen(s) = true
        acc(s) = e.getLong(1)
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, entries => {
      val acc = ctx.freshName("acc")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val slot = ctx.freshName("slot")
      s"""
         |long[] $acc = new long[$total];
         |boolean[] $seen = new boolean[$total];
         |int $n = $entries.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($entries.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: null entry at " + $i);
         |  }
         |  InternalRow $e = $entries.getStruct($i, 2);
         |  if ($e.isNullAt(0) || $e.isNullAt(1)) {
         |    throw new IllegalArgumentException(
         |      "$prettyName: null slot or count at entry " + $i);
         |  }
         |  long $slot = $e.getLong(0);
         |  if ($slot >= 0L && $slot < ${total}L) {
         |    if ($seen[(int) $slot]) {
         |      throw new IllegalArgumentException(
         |        "$prettyName: duplicate slot " + $slot);
         |    }
         |    $seen[(int) $slot] = true;
         |    $acc[(int) $slot] = $e.getLong(1);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DenseFromSparse =
    copy(child = newChild)
}

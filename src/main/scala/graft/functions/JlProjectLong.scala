package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: the whole JL ±1 projection of one
  * embedding — quantize each component ONCE (⌊x·scale⌋, the
  * [[graft.embed.Similarity.quantize]] arithmetic) and accumulate all
  * `outDims` signed sums in a tight primitive loop, returning
  * ARRAY<BIGINT>.
  *
  * Why an Expression and not composition: the compositional form (a
  * quantize `transform` HOF referenced by 16 `dot_long` calls) gets its
  * alias INLINED by CollapseProject — the interpreted per-element
  * lambda then runs once PER OUTPUT DIM (16×64 lambda dispatches per
  * row; measured ~20 s at 1e6 rows where this loop is ~1 s). Same exact
  * integers, same hashes — the [[DotProductLong]] "custom Expression
  * beats composition" path one level up.
  *
  * The sign matrix rides along as a literal `Array[Array[Long]]`
  * reference object (row-major, outDims × inDims) — plan-stable,
  * engine-replayable via [[graft.embed.Jl.signsSqlValues]]. Inputs must
  * be exactly inDims long (RAISES otherwise — the [[graft.embed.Jl
  * .project]] guard, enforced where the loop runs) with no NULL
  * elements (RAISES: a null component has no quantization). */
case class JlProjectLong(child: Expression, signs: Array[Array[Long]],
                         scale: Int)
  extends UnaryExpression {

  private val outDims = signs.length
  private val inDims = if (outDims == 0) 0 else signs(0).length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "jl_project_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  // lazy: the constructor runs on still-unresolved children during
  // analysis (withNewChildInternal copies), where dataType throws
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    if (xs.numElements() != inDims)
      throw new IllegalArgumentException(
        s"jl: embedding length ${xs.numElements()} != inDims $inDims")
    val acc = new Array[Long](outDims)
    var i = 0
    while (i < inDims) {
      if (xs.isNullAt(i))
        throw new IllegalArgumentException(
          s"jl: null embedding component at index $i")
      val x = if (isFloat) xs.getFloat(i).toDouble else xs.getDouble(i)
      val q = math.floor(x * scale).toLong
      var j = 0
      while (j < outDims) { acc(j) += signs(j)(i) * q; j += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("jlSigns", signs, "long[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, xs => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val q = ctx.freshName("q")
      s"""
         |if ($xs.numElements() != $inDims) {
         |  throw new IllegalArgumentException(
         |    "jl: embedding length " + $xs.numElements() + " != inDims $inDims");
         |}
         |long[] $acc = new long[$outDims];
         |for (int $i = 0; $i < $inDims; $i++) {
         |  if ($xs.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "jl: null embedding component at index " + $i);
         |  }
         |  long $q = (long) java.lang.Math.floor(
         |    ((double) $xs.$getter($i)) * ${scale}.0d);
         |  for (int $j = 0; $j < $outDims; $j++) {
         |    $acc[$j] += $signsRef[$j][$i] * $q;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectLong =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the MinHash signature
  * `sig[i] = min over h of ((a_i·h + b_i) mod p)` with the affine family
  * `a_i = 2654435761·(i+1) mod p`, `b_i = 40503·(i+1) mod p` — exactly
  * [[graft.text.Dedup.minhashSignatures]]'s published formula (the SQL
  * oracle replicates it digit for digit, so this kernel must too;
  * parity is spec-gated).
  *
  * Why native: the HOF spelling (`transform(sequence(0, k-1), i ->
  * array_min(transform(hs, h -> ...)))`) dispatches k·|hs| interpreted
  * lambdas per row — measured as the dominant cost of the signature
  * stage. This is one tight k·|hs| primitive loop inside whole-stage
  * codegen. All arithmetic stays exact: a, b, h < p <= 2^31 keeps
  * a·h + b under 2^62.
  *
  * NULL semantics match `array_min`: null input hashes are skipped; a
  * row with no usable hashes yields a signature of k NULLs.
  */
case class MinhashAffine(child: Expression, numHashes: Int, p: Long)
  extends UnaryExpression {
  require(numHashes >= 1, s"minhash_affine: numHashes must be >= 1, got $numHashes")
  require(p >= 2 && p <= (1L << 31), s"minhash_affine: need 2 <= p <= 2^31, got $p")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_affine"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    MinhashAffine.signature(a.asInstanceOf[ArrayData], numHashes, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = MinhashAffine.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.signature($a, $numHashes, ${p}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashAffine {
  def signature(hs: ArrayData, k: Int, p: Long): GenericArrayData = {
    val n = hs.numElements()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      val a = (2654435761L * (i + 1)) % p
      val b = (40503L * (i + 1)) % p
      var mn = Long.MaxValue
      var any = false
      var j = 0
      while (j < n) {
        if (!hs.isNullAt(j)) {
          val v = (a * hs.getLong(j) + b) % p
          if (v < mn) mn = v
          any = true
        }
        j += 1
      }
      out(i) = if (any) java.lang.Long.valueOf(mn) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"minhash_affine expects exactly 3 arguments (hashes, numHashes, p), got ${exprs.length}")
    (exprs(1), exprs(2)) match {
      case (Literal(k: Int, IntegerType), Literal(p: Long, LongType)) =>
        MinhashAffine(exprs.head, k, p)
      case (Literal(k: Int, IntegerType), Literal(p: Int, IntegerType)) =>
        MinhashAffine(exprs.head, k, p.toLong)
      case _ => throw new IllegalArgumentException(
        "minhash_affine: numHashes and p must be integer literals")
    }
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_affine")))
      reg.createOrReplaceTempFunction("minhash_affine", builder, "built-in")
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: turn an `array<bigint>` of non-negative set
  * ranks into the ⌈(max+1)/64⌉-word `array<bigint>` bitmap with those bits
  * set — the signature-build kernel of the small-universe Jaccard join
  * ([[graft.text.Dedup.jaccardPairsBitmap]]).
  *
  * Why native: the HOF spelling (`transform(sequence(0, max div 64), w ->
  * aggregate(filter(rs, ...), ...))`) re-scans the rank array once per
  * output word — O(words · |rs|) interpreted lambda dispatches per row,
  * measured as the DOMINANT cost of the whole join (the n-squared verify
  * itself is cheap AND+POPCNT). This is one primitive pass per row inside
  * whole-stage codegen.
  *
  * Contract: ranks must be in [0, 2^26) (a 2^26-bit bitmap is 8 MiB — far
  * past the small-universe regime this representation is for); a negative
  * or oversized rank throws rather than silently corrupting the bitmap.
  * An empty input yields an empty bitmap (zero words) — `bit_and_count`
  * treats missing high words as zeros, so widths never need to agree.
  */
case class BitmapFromRanks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_from_ranks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val rs = a.asInstanceOf[ArrayData]
    val n = rs.numElements()
    var mx = -1L
    var i = 0
    while (i < n) {
      BitmapFromRanks.checkNotNull(rs, i) // getLong on a null slot reads 0 silently
      val r = rs.getLong(i)
      BitmapFromRanks.checkRank(r)
      if (r > mx) mx = r
      i += 1
    }
    val words = new Array[Long](if (n == 0) 0 else (mx >> 6).toInt + 1)
    i = 0
    while (i < n) { val r = rs.getLong(i); words((r >> 6).toInt) |= 1L << (r & 63); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val r = ctx.freshName("r")
      val words = ctx.freshName("words")
      val cls = classOf[BitmapFromRanks].getName
      s"""
         |int $n = $a.numElements();
         |long $mx = -1L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $cls.checkNotNull($a, $i);
         |  long $r = $a.getLong($i);
         |  $cls.checkRank($r);
         |  if ($r > $mx) $mx = $r;
         |}
         |long[] $words = new long[$n == 0 ? 0 : (int) ($mx >> 6) + 1];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $r = $a.getLong($i);
         |  $words[(int) ($r >> 6)] |= 1L << ($r & 63);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BitmapFromRanks {
  /** Bitmaps past 2^26 bits (8 MiB/row) are outside the small-universe
    * regime — see class doc. Shared by interpreted and generated code. */
  val MaxRank: Long = 1L << 26

  def checkRank(r: Long): Unit =
    if (r < 0 || r >= MaxRank) throw new IllegalArgumentException(
      s"bitmap_from_ranks: rank $r out of [0, $MaxRank)")

  /** `getLong` on a null slot silently reads 0 — a NULL rank must throw
    * like an out-of-range one, not set bit 0 (class doc contract). */
  def checkNotNull(rs: ArrayData, i: Int): Unit =
    if (rs.isNullAt(i)) throw new IllegalArgumentException(
      s"bitmap_from_ranks: NULL rank at position $i")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"bitmap_from_ranks expects exactly 1 argument, got ${exprs.length}")
    BitmapFromRanks(exprs.head)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bitmap_from_ranks")))
      reg.createOrReplaceTempFunction("bitmap_from_ranks", builder, "built-in")
  }
}

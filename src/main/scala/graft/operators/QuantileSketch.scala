package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Re-aggregatable quantile sketches — the quantile column of a
  * pre-aggregated cube. Exact order statistics ([[OrderStats]], the q178
  * per-group machinery) answer one ad-hoc query well; a dashboard cube
  * wants per-cell state it can ROLL UP (day→week, sku→category) without
  * revisiting the raw rows. Distinct counts already have that here (HLL
  * rollup, SketchRollupSpec); this is the quantile counterpart.
  *
  * The sketch is a DETERMINISTIC fixed-bin count vector over a declared
  * domain [lo, hi): `bins` equal-width bins plus an underflow and an
  * overflow slot (layout: slot 0 = v < lo; slot i∈[1,bins] =
  * [lo+(i−1)·w, lo+i·w) with w = (hi−lo)/bins; slot bins+1 = v ≥ hi).
  * Unlike KLL/GK compactors, counts form a commutative monoid under
  * vector addition, so the cube contract is EXACT, not approximate:
  *
  *   sketch(A ⊎ B) == merge(sketch(A), sketch(B))   (cell-for-cell)
  *
  * in any grouping/order — what makes a sketch column safely storable
  * and re-aggregatable. The approximation lives only in the QUERY:
  * [[quantileLower]] returns the lower edge of the bin holding the
  * rank-⌈q·n⌉ value, so its error is bounded by one bin width; with an
  * integer domain at w = 1 it is EXACT (equals SQL's smallest value whose
  * cumulative count reaches the rank), which is what the DuckDB gates
  * pin.
  *
  * Scale shape: [[sketch]] is ONE map-side-combined hash aggregation of
  * bins+2 conditional counts (whole-stage codegen, no UDAF, no shuffle of
  * values — the exchange per group is one fixed-width Long vector);
  * [[rollup]] re-aggregates stored sketches the same way; [[merge]] is a
  * `zip_with` two-column combine; [[quantileLower]]/[[total]] are
  * higher-order-function folds over the (small, fixed-size) array. `bins`
  * is capped at 1024 so the widest aggregate stays inside what codegen
  * splits comfortably.
  */
object QuantileSketch {

  /** Slots in a sketch array for `bins` bins (+ under/overflow). */
  def slots(bins: Int): Int = bins + 2

  private def width(lo: Long, hi: Long, bins: Int): Long = {
    require(bins >= 1 && bins <= 1024, s"bins must be in [1, 1024], got $bins")
    require(lo < hi, s"domain must be non-empty: [$lo, $hi)")
    require((hi - lo) % bins == 0,
      s"bin width must be integral: ($hi - $lo) is not divisible by $bins")
    (hi - lo) / bins
  }

  /** One sketch per `groupCols` cell (global when empty) over BIGINT
    * `valueCol` — NULL values are ignored (they carry no rank). Output:
    * groupCols..., `out` ARRAY<BIGINT> of length bins+2.
    *
    * With `weightCol` (non-negative BIGINT; NULL or negative RAISES —
    * silently defaulting a weight would shift every quantile) each slot
    * accumulates SUM(weight) instead of COUNT: the sketch answers
    * WEIGHTED quantiles ("the value at which cumulative weight reaches
    * q·W" — token-weighted score distributions, revenue-weighted size
    * distributions). Same vector-add monoid, same rollup/merge/read
    * machinery — a count sketch IS the all-weights-1 case. Keep total
    * weight·den inside Int64 ([[quantileLower]] bounds den at 10^6, so
    * W ≤ ~9.2e12 — rescale heavier weight columns). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             lo: Long, hi: Long, bins: Int, out: String = "sketch",
             weightCol: Option[String] = None): DataFrame = {
    val w = width(lo, hi, bins)
    (groupCols ++ weightCol :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(df.schema(valueCol).dataType == LongType, s"$valueCol must be BIGINT")
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
    weightCol.foreach(c => require(df.schema(c).dataType == LongType,
      s"$c must be BIGINT"))
    val slot = when(col("__qs_v") < lo, 0)
      .when(col("__qs_v") >= hi, bins + 1)
      // all-Long `div` keeps the binning exact for the full BIGINT domain
      // (a double-floor path would misplace values past 2^53)
      .otherwise(expr(s"(__qs_v - ${lo}L) div ${w}L").cast(IntegerType) + 1)
    val wexpr = weightCol match {
      case None => lit(1L)
      case Some(c) => when(col(c).isNull || col(c) < 0L, raise_error(
          format_string(s"sketch: weight '$c' must be a non-negative " +
            "BIGINT, got %s", coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c))
    }
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__qs_v", col(valueCol))
      .withColumn("__qs_w", wexpr)
      .withColumn("__qs_slot", slot)
    // coalesce: a global (no-group) sketch of an empty input is the
    // all-zero vector, not NULLs (SUM over zero rows is NULL in SQL)
    val aggs = (0 until slots(bins)).map(i =>
      coalesce(sum(when(col("__qs_slot") === i, col("__qs_w")).otherwise(0L)),
        lit(0L)).as(s"__qs_c$i"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until slots(bins)).map(i => col(s"__qs_c$i")): _*).as(out): _*)
  }

  /** Element-wise sum of two sketch columns (same domain by contract) —
    * the ⊕ of the cube contract. */
  def merge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** The SPARSE form of [[sketch]] (groupCols..., slot, c — zero-count
    * bins absent): the storage/transport form the streaming maintainer
    * keeps its segments in — O(occupied bins) rows instead of
    * O(keys · (bins+2)) dense arrays. Identical slot arithmetic and
    * counts; [[graft.operators.CountMinSketch.assembleSparse]]
    * densifies back to the [[sketch]] shape (absent slots read 0). */
  private[graft] def sketchSparse(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String, lo: Long, hi: Long,
                                  bins: Int): DataFrame = {
    val w = width(lo, hi, bins)
    require(df.schema(valueCol).dataType == LongType, s"$valueCol must be BIGINT")
    val slot = when(col(valueCol) < lo, 0)
      .when(col(valueCol) >= hi, bins + 1)
      .otherwise(expr(s"(`$valueCol` - ${lo}L) div ${w}L").cast(IntegerType) + 1)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ slot.as("slot"): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Re-aggregates a stored sketch column to coarser `groupCols` cells
    * (global when empty): the cube rollup, touching only the sketch
    * vectors — never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, bins: Int,
             groupCols: Seq[String]): DataFrame = {
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    require(bins >= 1 && bins <= 1024, s"bins must be in [1, 1024], got $bins")
    // runtime guard: a `bins` that disagrees with the stored array length
    // would otherwise silently truncate (smaller bins drops overflow
    // counts) or zero-fill (element_at out-of-bounds NULL + coalesce) —
    // wrong sketches, not an error. raise_error is NullType, coerced to
    // the array branch type by CaseWhen.
    val sk = when(size(col(sketchCol)) === slots(bins), col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: sketch array length %s != ${slots(bins)} (bins=$bins + " +
          "under/overflow slots) — bins must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    val aggs = (0 until slots(bins)).map(i =>
      coalesce(sum(element_at(sk, i + 1)), lit(0L)).as(s"__qs_c$i"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until slots(bins)).map(i => col(s"__qs_c$i")): _*).as(sketchCol): _*)
  }

  /** Total count held by a sketch (BIGINT). Native one-pass sum
    * ([[graft.functions.LongArraySum]]) — the `aggregate` HOF is
    * CodegenFallback, one interpreted lambda dispatch per bin per row
    * (r15 optimization round; same values, ANSI overflow still raises). */
  def total(sk: Column): Column =
    org.apache.spark.sql.execution.GraftColumnBridge.column(
      graft.functions.LongArraySum(
        org.apache.spark.sql.execution.GraftColumnBridge.expression(sk)))

  /** The (num/den)-quantile read from a sketch: the lower edge of the
    * first slot where the cumulative count reaches rank ⌈(num·n)/den⌉
    * (compared cross-multiplied — `cum·den ≥ n·num` — so no division
    * anywhere). NULL for an empty sketch and for a rank landing in the
    * underflow slot (only "< lo" is known there); `hi` for the overflow
    * slot ("≥ hi"). At bin width 1 over an integer domain this is the
    * exact classic lower quantile. */
  def quantileLower(sk: Column, num: Int, den: Int,
                    lo: Long, hi: Long, bins: Int): Column = {
    require(den >= 1 && num >= 1 && num <= den,
      s"quantile num/den must satisfy 1 <= num <= den, got $num/$den")
    // the rank test cross-multiplies (cum·den ≥ n·num — no division), so
    // den·n must stay inside Int64: bounding den at 10^6 keeps the test
    // exact to ~9.2e12 total count (raise the sketch granularity, not
    // den, past that)
    require(den <= 1000000, s"quantile den must be <= 1000000, got $den")
    val w = width(lo, hi, bins)
    // ONE native pass computes total + Int64 guard + rank walk
    // ([[graft.functions.SketchQuantileSlot]], r15 optimization round):
    // the previous `aggregate` HOF walk was CodegenFallback AND its
    // lambda referenced the (itself O(bins)) total per element —
    // O(bins²) interpreted work per read per row, measured 2.3 s in one
    // task on q219's 3-read snapshot scan. Same cross-multiplied rank
    // test, same guard message, same slot semantics, same hashes.
    val n = total(sk)
    val slot = org.apache.spark.sql.execution.GraftColumnBridge.column(
      graft.functions.SketchQuantileSlot(
        org.apache.spark.sql.execution.GraftColumnBridge.expression(sk),
        num, den))
    when(n === 0L, lit(null).cast(LongType))
      .when(slot === 0, lit(null).cast(LongType))
      .when(slot === bins + 1, lit(hi))
      .otherwise(lit(lo) + (slot.cast(LongType) - 1L) * w)
  }

  /** One-call sketch → quantile read-back (the SQL TVF shape):
    * groupCols..., n, q_<num>_<den> per requested quantile, ordered by
    * the group columns. */
  def summary(df: DataFrame, groupCols: Seq[String], valueCol: String,
              lo: Long, hi: Long, bins: Int, qs: Seq[(Int, Int)],
              weightCol: Option[String] = None): DataFrame = {
    require(qs.nonEmpty, "summary needs at least one quantile")
    val sk = sketch(df, groupCols, valueCol, lo, hi, bins,
      weightCol = weightCol)
    val out = sk.select(groupCols.map(col) ++ (total(col("sketch")).as("n") +:
      qs.map { case (nu, de) =>
        quantileLower(col("sketch"), nu, de, lo, hi, bins).as(s"q_${nu}_$de")
      }): _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }
}

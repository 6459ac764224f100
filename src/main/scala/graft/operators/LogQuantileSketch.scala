package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unknown-domain re-aggregatable quantile sketch: DECIMAL-LOG binning.
  *
  * [[QuantileSketch]]'s fixed-bin vector is exact but needs a DECLARED
  * integral-width domain `[lo, hi)` — fine for a pinned dashboard axis,
  * useless for an unbounded BIGINT column (byte sizes, latencies, token
  * counts). This form needs NO domain: a non-negative BIGINT value lands
  * in the bucket keyed by its first `digits` decimal digits with the
  * remaining digits zeroed — the bucket's lower EDGE — so bucket width
  * tracks magnitude (width `10^s` at scale `s = digitCount − digits`)
  * and the entire Long range occupies at most
  * `(19−digits)·9·10^(digits−1) + 10^digits` buckets (~1.7k at the
  * default `digits = 2`). All binning is exact integer arithmetic
  * (digit count + a power-of-ten lookup — never a floating log, which
  * misbins at bucket edges).
  *
  * The sketch of a group is a ROW SET `(groupCols..., edge, cnt)`, not a
  * nested vector: bucket counts form the same vector-add monoid as the
  * fixed-bin sketch, so merge/rollup is PLAIN RE-AGGREGATION —
  * `sketch(A ⊎ B) == rollup(sketch(A) ∪ sketch(B))` cell-for-cell, in
  * any grouping or order — and the relational shape is also the 100 TB
  * shape: [[sketch]] is ONE map-side-combined count per (group, bucket)
  * (bounded state per group, never a value shuffle), [[rollup]] the same
  * over stored rows, [[quantileLower]] a per-group window over the
  * BOUNDED bucket set (≤ ~1.7k rows per group by construction — the
  * window input is sketch-sized, never data-sized).
  *
  * The approximation lives only in the QUERY: [[quantileLower]] returns
  * the lower edge of the bucket holding the rank-⌈q·n⌉ value, so the
  * answer is exactly `bucketEdge(trueQuantile)` — within one bucket
  * width below the true value, a relative error < `10^(1−digits)`
  * (`digits = 2` → under 10%), and EXACT for values below `10^digits`.
  *
  * Scope bound: values must be NON-NEGATIVE (a negative value RAISES —
  * magnitudes are the use case; a signed domain has no single log
  * scale). NULLs carry no rank and are ignored.
  */
object LogQuantileSketch {

  /** 10^0 .. 10^18 — every Long digit-count, exact. */
  private val POW10: Array[Long] = Iterator.iterate(1L)(_ * 10L).take(19).toArray

  /** Upper bound on DISTINCT buckets anywhere in [0, Long.Max] —
    * the state-per-group contract. */
  def maxBuckets(digits: Int): Long =
    (19 - digits).toLong * 9 * POW10(digits - 1) + POW10(digits)

  /** Reference edge for one value (driver-side twin of the column
    * expression; spec oracle). */
  def edgeOf(v: Long, digits: Int): Long = {
    require(v >= 0, s"logSketch: negative value $v")
    val d = v.toString.length
    val s = math.max(d - digits, 0)
    v / POW10(s) * POW10(s)
  }

  private def validate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       digits: Int): Unit = {
    require(digits >= 1 && digits <= 4,
      s"digits must be in [1, 4], got $digits")
    (groupCols :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(df.schema(valueCol).dataType == LongType, s"$valueCol must be BIGINT")
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
  }

  /** One sketch row per (groupCols..., occupied bucket): `edge` BIGINT
    * (bucket lower edge), `cnt` BIGINT. Output ordered by nothing —
    * it's an intermediate table by contract.
    *
    * With `weightCol` (non-negative BIGINT; NULL or negative RAISES —
    * silently defaulting a weight would shift every quantile) `cnt`
    * accumulates SUM(weight) instead of the row count: weighted
    * quantiles over an UNDECLARED domain (token-weighted score
    * distributions over unbounded magnitudes). The count sketch is the
    * all-weights-1 case; the rollup/quantile machinery is weight-blind
    * (it only ever re-adds `cnt`). Keep total weight·den inside Int64
    * ([[quantiles]] bounds den at 10^6 → W ≤ ~9.2e12). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             digits: Int = 2, weightCol: Option[String] = None): DataFrame = {
    validate(df, groupCols, valueCol, digits)
    weightCol.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
    }
    val wexpr = weightCol match {
      case None => lit(1L)
      case Some(c) => when(col(c).isNull || col(c) < 0L, raise_error(
          format_string(s"logSketch: weight '$c' must be a non-negative " +
            "BIGINT, got %s", coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c))
    }
    val p10 = array(POW10.map(lit).toIndexedSeq: _*)
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__lq_v", col(valueCol))
      .withColumn("__lq_w", wexpr)
      .withColumn("__lq_pw", element_at(p10,
        greatest(length(col("__lq_v").cast("string")) - lit(digits), lit(0)) + 1))
      .withColumn("edge", when(col("__lq_v") < 0,
          raise_error(format_string(
            "logSketch: negative value %s — log binning needs a " +
              "non-negative magnitude", col("__lq_v").cast("string"))))
        .otherwise(expr("__lq_v div __lq_pw") * col("__lq_pw")))
    base.groupBy((groupCols :+ "edge").map(col): _*)
      .agg(sum(col("__lq_w")).as("cnt"))
  }

  /** Re-aggregates stored sketch rows to coarser `groupCols` cells: the
    * cube rollup — touches only the O(buckets) sketch rows, never the
    * raw data. `merge(a, b) = rollup(a ∪ b)` by the monoid contract. */
  def rollup(df: DataFrame, groupCols: Seq[String],
             edgeCol: String = "edge", cntCol: String = "cnt"): DataFrame = {
    Seq(edgeCol, cntCol).foreach(c =>
      require(df.columns.contains(c), s"no such column: $c"))
    df.groupBy((groupCols :+ edgeCol).map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol))
  }

  /** Per-group lower quantiles read from a sketch table: for each
    * requested num/den, the smallest edge whose cumulative count reaches
    * rank ⌈(num·n)/den⌉ — exactly `bucketEdge(true lower quantile)`
    * (cross-multiplied rank test, no division; `den ≤ 10^6` keeps it
    * inside Int64). Output: groupCols..., n, q_<num>_<den>..., ordered
    * by the group columns. The window runs over the SKETCH rows —
    * bounded at [[maxBuckets]] per group — so a single-task global
    * window (empty `groupCols`) is still O(1.7k) rows, never data-sized. */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
                qs: Seq[(Int, Int)],
                edgeCol: String = "edge", cntCol: String = "cnt"): DataFrame = {
    require(qs.nonEmpty, "quantiles needs at least one num/den")
    qs.foreach { case (num, den) =>
      require(den >= 1 && num >= 1 && num <= den,
        s"quantile num/den must satisfy 1 <= num <= den, got $num/$den")
      require(den <= 1000000, s"quantile den must be <= 1000000, got $den")
    }
    Seq(edgeCol, cntCol).foreach(c =>
      require(sk.columns.contains(c), s"no such column: $c"))
    // constant partition key for the global case: the window input is the
    // BOUNDED bucket table (maxBuckets rows), so one task is the plan
    val parts: Seq[Column] =
      if (groupCols.nonEmpty) groupCols.map(col) else Seq(lit(1))
    val w = Window.partitionBy(parts: _*).orderBy(col(edgeCol))
    val wAll = Window.partitionBy(parts: _*)
    val cum = sk
      .withColumn("__lq_cum", sum(col(cntCol)).over(w))
      .withColumn("__lq_n", sum(col(cntCol)).over(wAll))
    val aggs = max(col("__lq_n")).as("n") +:
      qs.map { case (num, den) =>
        min(when(col("__lq_cum") * den >= col("__lq_n") * num, col(edgeCol)))
          .as(s"q_${num}_$den")
      }
    val out = cum.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  /** One-call sketch → quantile read-back (the SQL TVF shape). */
  def summary(df: DataFrame, groupCols: Seq[String], valueCol: String,
              digits: Int, qs: Seq[(Int, Int)],
              weightCol: Option[String] = None): DataFrame =
    quantiles(sketch(df, groupCols, valueCol, digits, weightCol), groupCols, qs)
}

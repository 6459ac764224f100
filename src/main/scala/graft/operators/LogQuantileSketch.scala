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
  * SIGNED values are supported (r14 — deltas, PnL, balance changes): a
  * negative value bins on its MAGNITUDE but keys the bucket by the
  * negated magnitude-bucket UPPER edge (ceiling), so the key is still
  * the bucket's numeric LOWER edge and binning stays monotone across
  * the whole signed line — the same [[quantiles]] read works unchanged
  * and its answer stays ≤ the true value within relative error
  * `10^(1−digits)` of |value| (EXACT for |v| < 10^digits, matching the
  * positive side). The signed line occupies ≤ `2·maxBuckets(digits)+1`
  * buckets. Two scope notes: `Long.MinValue` RAISES (it has no Long
  * magnitude), and the single deepest negative bucket whose ceiling
  * would overflow Int64 is keyed `Long.MinValue` (still a lower bound;
  * relative error there < 0.3%). NULLs carry no rank and are ignored.
  */
object LogQuantileSketch {

  /** 10^0 .. 10^18 — every Long digit-count, exact. */
  private val POW10: Array[Long] = Iterator.iterate(1L)(_ * 10L).take(19).toArray

  /** Upper bound on DISTINCT buckets anywhere in [0, Long.Max] —
    * the state-per-group contract. The full SIGNED line is bounded by
    * `2·maxBuckets + 1` (each sign's lattice, plus the one clamped
    * deepest-negative bucket). */
  def maxBuckets(digits: Int): Long =
    (19 - digits).toLong * 9 * POW10(digits - 1) + POW10(digits)

  /** Reference edge for one value (driver-side twin of the column
    * expression; spec oracle). Negative values key by the negated
    * magnitude-bucket CEILING (their bucket's numeric lower edge);
    * the one ceiling that would overflow clamps to Long.MinValue. */
  def edgeOf(v: Long, digits: Int): Long = {
    require(v != Long.MinValue,
      "logSketch: Long.MinValue has no Long magnitude — rescale")
    val m = math.abs(v)
    val d = m.toString.length
    val s = math.max(d - digits, 0)
    val pw = POW10(s)
    val fe = m / pw * pw
    if (v >= 0) fe
    else if (m == fe) -fe
    else if (fe > Long.MaxValue - pw) Long.MinValue
    else -(fe + pw)
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
    // Long.MinValue is pre-raised (its magnitude is not a Long); every
    // other value bins on |v|: positives key the magnitude-bucket FLOOR,
    // negatives the negated CEILING — both are the bucket's numeric
    // lower edge, so binning is monotone over the whole signed line
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__lq_v", when(col(valueCol) === Long.MinValue,
          raise_error(lit("logSketch: value -9223372036854775808 has no " +
            "Long magnitude — rescale the column")))
        .otherwise(col(valueCol)))
      .withColumn("__lq_w", wexpr)
      .withColumn("__lq_m", abs(col("__lq_v")))
      .withColumn("__lq_pw", element_at(p10,
        greatest(length(col("__lq_m").cast("string")) - lit(digits), lit(0)) + 1))
      .withColumn("__lq_fe", expr("__lq_m div __lq_pw") * col("__lq_pw"))
      .withColumn("edge",
        when(col("__lq_v") >= 0, col("__lq_fe"))
          .when(col("__lq_m") === col("__lq_fe"), -col("__lq_fe"))
          // ceiling would overflow Int64 (only |v| > 92·10^17 at the
          // default digits): clamp to the Long.MinValue sentinel bucket
          .when(col("__lq_fe") > lit(Long.MaxValue) - col("__lq_pw"),
            lit(Long.MinValue))
          .otherwise(-(col("__lq_fe") + col("__lq_pw"))))
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
    // eager Int64 guard on the cross-multiplied rank test (cum ≤ n, so n
    // is the binding factor): a total·den past Long.Max would otherwise
    // surface as a generic ANSI overflow deep in the window
    val lim = Long.MaxValue / qs.map(_._2).max
    val cum = sk
      .withColumn("__lq_cum", sum(col(cntCol)).over(w))
      .withColumn("__lq_n", when(sum(col(cntCol)).over(wAll) > lim,
          raise_error(format_string("logSketch quantiles: group total %s × " +
            s"den overflows Int64 (limit $lim) — rescale weights or lower den",
            sum(col(cntCol)).over(wAll).cast("string"))))
        .otherwise(sum(col(cntCol)).over(wAll)))
    // the `__lq_n > 0` conjunct maps an all-zero-weight group to NULL
    // (min over no rows) — the empty-sketch semantics QuantileSketch
    // pins — instead of the first bucket edge (0 ≥ 0 is true)
    val aggs = max(col("__lq_n")).as("n") +:
      qs.map { case (num, den) =>
        min(when(col("__lq_n") > 0 &&
            col("__lq_cum") * den >= col("__lq_n") * num, col(edgeCol)))
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

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Exact-rational per-series AUTOCORRELATION (the sample ACF — the
  * missing diagnostic beside the smoothers [[graft.events.EventOps
  * .ewma]]/`holtSmooth` and the seasonality/anomaly gates: which lags
  * carry structure at all). For a series x_1..x_n (one row per
  * distinct t, BIGINT x — the engine's integer-cents convention):
  *
  *   r_ℓ = Σ_{t≤n−ℓ} (x_t − μ)(x_{t+ℓ} − μ)  /  Σ_t (x_t − μ)²
  *
  * with μ the full-series mean. Expanding μ = S/n and scaling by n²
  * makes BOTH sides exact integers:
  *
  *   num_ℓ·n² = n²·P_ℓ − n·S·(H_ℓ + T_ℓ) + (n−ℓ)·S²
  *   den·n²   = n²·Q − n·S²
  *
  * where P_ℓ = Σ x_t·x_{t+ℓ}, H_ℓ/T_ℓ = the head/tail partial sums of
  * the paired rows, S = Σx, Q = Σx². The emitted acf is ONE IEEE
  * division of those exact integers (DECIMAL(38,0) accumulation) — the
  * [[KmvSketch]]/[[CountSketch]] determinism recipe, so the read
  * replays bit-for-bit in any engine and the gate oracle-checks the
  * DOUBLE itself. NULL when den = 0 (constant series) or n ≤ ℓ (no
  * pairs) — undefined, not 0.
  *
  * Scale shape: ONE partitioned window pass (maxLag `lead` columns
  * over partitionBy(series) — never a global window) and ONE map-side-
  * combined aggregation per series; the exchange carries each row once
  * plus a fixed 3+3·maxLag-column vector per series. Magnitude bound
  * (the CMS Int64-note convention): the DECIMAL(38,0) chain needs
  * n²·Σ|x_t·x_{t+ℓ}| < 10^38 — ANSI raises loudly past it; rescale
  * heavier series.
  *
  * Duplicate t within a series RAISES (the family's loud-guard
  * stance): the lag pairing would be ordering-dependent, i.e. silently
  * nondeterministic. */
object Autocorr {

  def acf(df: DataFrame, seriesCols: Seq[String], tCol: String,
          xCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"maxLag must be in [1, 64], got $maxLag")
    (seriesCols ++ Seq(tCol, xCol)).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(df.schema(xCol).dataType == LongType, s"$xCol must be BIGINT")
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(tCol))
    val dupW = Window.partitionBy((seriesCols :+ tCol).map(col): _*)
    val guarded = when(count(lit(1)).over(dupW) > 1, raise_error(lit(
        s"acf: duplicate $tCol within a series — lag pairing would be " +
          "ordering-dependent; aggregate to one row per t first")))
      .otherwise(col(xCol))
    def dec(c: Column) = c.cast(DecimalType(19, 0))
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))
    val base = df
      .filter(col(tCol).isNotNull && col(xCol).isNotNull)
      .withColumn("__ac_x", guarded)
    val withLeads = (1 to maxLag).foldLeft(base)((d, l) =>
      d.withColumn(s"__ac_l$l", lead(col("__ac_x"), l).over(w)))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast(DecimalType(19, 0)).as("__ac_n"),
        coalesce(sum(dec(col("__ac_x"))), zero).as("__ac_s"),
        coalesce(sum(dec(col("__ac_x")) * dec(col("__ac_x"))), zero)
          .as("__ac_q")) ++
      (1 to maxLag).flatMap(l => Seq(
        coalesce(sum(dec(col("__ac_x")) * dec(col(s"__ac_l$l"))), zero)
          .as(s"__ac_p$l"),
        coalesce(sum(when(col(s"__ac_l$l").isNotNull, dec(col("__ac_x")))),
          zero).as(s"__ac_h$l"),
        coalesce(sum(dec(col(s"__ac_l$l"))), zero).as(s"__ac_t$l")))
    val ag = withLeads.groupBy(seriesCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val n = col("__ac_n"); val s = col("__ac_s"); val q = col("__ac_q")
    val lagRows = array((1 to maxLag).map { l =>
      val num = n * n * col(s"__ac_p$l") -
        n * s * (col(s"__ac_h$l") + col(s"__ac_t$l")) +
        (n - l) * s * s
      val den = n * n * q - n * s * s
      struct(lit(l.toLong).as("lag"),
        when(den === zero || n <= l, lit(null).cast("double"))
          .otherwise(num.cast("double") / den.cast("double")).as("acf"))
    }: _*)
    ag.select(seriesCols.map(col) ++ Seq(n.cast(LongType).as("n"),
        explode(lagRows).as("__ac_r")): _*)
      .select(seriesCols.map(col) ++ Seq(col("n"),
        col("__ac_r.lag").as("lag"), col("__ac_r.acf").as("acf")): _*)
      .orderBy((seriesCols :+ "lag").map(col): _*)
  }

  /** Exact-rational CROSS-correlation (the sample CCF — [[acf]]'s
    * two-series sibling; which lags of x LEAD y is the classic
    * leading-indicator diagnostic). For aligned series (one row per
    * distinct t carrying BOTH x_t and y_t; rows where either is NULL
    * drop — the pairing grid is their common support) and ℓ ∈ [−L, L]:
    *
    *   r_ℓ = Σ_t (x_t − μx)(y_{t+ℓ} − μy)
    *         / √( Σ(x−μx)² · Σ(y−μy)² )
    *
    * (negative ℓ pairs y_t with the LATER x_{t+|ℓ|} — x lagging).
    * Same determinism recipe as [[acf]]: scaling by n² makes the
    * numerator and both denominator factors exact DECIMAL(38,0)
    * integers; the emitted DOUBLE is CAST(num)/√(CAST(dx)·CAST(dy)) —
    * a fixed chain of correctly rounded IEEE ops (the
    * [[graft.embed.Similarity]] score shape), identical on every
    * engine, so the CCF values themselves oracle-gate. NULL when
    * either series is constant (dx·dy = 0) or n ≤ |ℓ|. r_0 is the
    * plain Pearson correlation of the aligned series.
    *
    * Scale shape: ONE partitioned window pass (maxLag leads of each of
    * x and y — never a global window) and ONE map-side-combined
    * aggregation per series; same magnitude bound and duplicate-t
    * RAISE as [[acf]]. */
  def ccf(df: DataFrame, seriesCols: Seq[String], tCol: String,
          xCol: String, yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64,
      s"maxLag must be in [1, 64], got $maxLag")
    (seriesCols ++ Seq(tCol, xCol, yCol)).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(xCol != yCol, "xCol and yCol must differ")
    Seq(xCol, yCol).foreach(c =>
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT"))
    val w = Window.partitionBy(seriesCols.map(col): _*).orderBy(col(tCol))
    val dupW = Window.partitionBy((seriesCols :+ tCol).map(col): _*)
    val guarded = when(count(lit(1)).over(dupW) > 1, raise_error(lit(
        s"ccf: duplicate $tCol within a series — lag pairing would be " +
          "ordering-dependent; aggregate to one row per t first")))
      .otherwise(col(xCol))
    def dec(c: Column) = c.cast(DecimalType(19, 0))
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))
    val base = df
      .filter(col(tCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .withColumn("__cc_x", guarded)
      .withColumn("__cc_y", col(yCol))
    val withLeads = (1 to maxLag).foldLeft(base)((d, l) => d
      .withColumn(s"__cc_lx$l", lead(col("__cc_x"), l).over(w))
      .withColumn(s"__cc_ly$l", lead(col("__cc_y"), l).over(w)))
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast(DecimalType(19, 0)).as("__cc_n"),
        coalesce(sum(dec(col("__cc_x"))), zero).as("__cc_sx"),
        coalesce(sum(dec(col("__cc_y"))), zero).as("__cc_sy"),
        coalesce(sum(dec(col("__cc_x")) * dec(col("__cc_x"))), zero)
          .as("__cc_qx"),
        coalesce(sum(dec(col("__cc_y")) * dec(col("__cc_y"))), zero)
          .as("__cc_qy"),
        coalesce(sum(dec(col("__cc_x")) * dec(col("__cc_y"))), zero)
          .as("__cc_p0")) ++
      (1 to maxLag).flatMap(l => Seq(
        // lag +l: x_t against y_{t+l}
        coalesce(sum(dec(col("__cc_x")) * dec(col(s"__cc_ly$l"))), zero)
          .as(s"__cc_pp$l"),
        coalesce(sum(when(col(s"__cc_ly$l").isNotNull, dec(col("__cc_x")))),
          zero).as(s"__cc_hx$l"),
        coalesce(sum(dec(col(s"__cc_ly$l"))), zero).as(s"__cc_ty$l"),
        // lag −l: y_t against x_{t+l}
        coalesce(sum(dec(col("__cc_y")) * dec(col(s"__cc_lx$l"))), zero)
          .as(s"__cc_pn$l"),
        coalesce(sum(when(col(s"__cc_lx$l").isNotNull, dec(col("__cc_y")))),
          zero).as(s"__cc_hy$l"),
        coalesce(sum(dec(col(s"__cc_lx$l"))), zero).as(s"__cc_tx$l")))
    val ag = withLeads.groupBy(seriesCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val n = col("__cc_n")
    val sx = col("__cc_sx"); val sy = col("__cc_sy")
    val dx = n * n * col("__cc_qx") - n * sx * sx
    val dy = n * n * col("__cc_qy") - n * sy * sy
    def read(num: Column, l: Int) =
      when(dx === zero || dy === zero || n <= l, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          sqrt(dx.cast("double") * dy.cast("double")))
    val lagRows = array(
      ((1 to maxLag).reverse.map { l =>
        val num = n * n * col(s"__cc_pn$l") -
          n * sy * col(s"__cc_tx$l") - n * sx * col(s"__cc_hy$l") +
          (n - l) * sx * sy
        struct(lit(-l.toLong).as("lag"), read(num, l).as("ccf"))
      } :+ {
        val num0 = n * n * col("__cc_p0") - n * sx * sy
        struct(lit(0L).as("lag"), read(num0, 0).as("ccf"))
      }) ++
      (1 to maxLag).map { l =>
        val num = n * n * col(s"__cc_pp$l") -
          n * sy * col(s"__cc_hx$l") - n * sx * col(s"__cc_ty$l") +
          (n - l) * sx * sy
        struct(lit(l.toLong).as("lag"), read(num, l).as("ccf"))
      }: _*)
    ag.select(seriesCols.map(col) ++ Seq(n.cast(LongType).as("n"),
        explode(lagRows).as("__cc_r")): _*)
      .select(seriesCols.map(col) ++ Seq(col("n"),
        col("__cc_r.lag").as("lag"), col("__cc_r.ccf").as("ccf")): _*)
      .orderBy((seriesCols :+ "lag").map(col): _*)
  }
}

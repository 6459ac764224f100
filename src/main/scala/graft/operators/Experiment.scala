package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout — per-variant conversion counts with exact
  * effect-size fractions against a named control. The statistics a
  * dashboard derives (rates, relative lift, odds ratio) are ratios of
  * integer counts; emitting them AS integer fractions keeps the report
  * engine-replayable and lets the caller pick display precision (float
  * rates disagree in the last digit across engines — a diff that pages
  * someone at 3am).
  */
object Experiment {

  /** Per-unit assignments (one row per experimental unit — dedupe
    * upstream; a unit counted twice biases every statistic) with a 0/1
    * BIGINT conversion flag. Output: one row per non-control variant,
    * with the control's counts attached and two exact effect fractions —
    * rate ratio rr = (conv_t·n_c) / (conv_c·n_t) and odds ratio
    * or = (conv_t·(n_c−conv_c)) / (conv_c·(n_t−conv_t)) — as
    * numerator/denominator BIGINT pairs (overflow-guarded: counts
    * beyond ~3e9 units raise; rescale by pre-aggregating units).
    * A zero-conversion control makes both denominators 0 — kept as 0,
    * the caller's "not yet powered" signal, never a division.
    *
    * Scale shape: ONE map-side-combined aggregation collapses units to
    * O(#variants) rows; the control's two counts are an O(1) driver
    * scalar (the decayedScore/resample bounded-state class) folded into
    * the projection as literals — a 1-row broadcast cross join would
    * constant-fold its key and plan as the nested-loop cross the gate
    * plan audit bans (audit-caught during development). A missing
    * control variant raises. Output: (variant, n, conv, n_ctl,
    * conv_ctl, rr_num, rr_den, or_num, or_den), variant-ordered. */
  def abReport(units: DataFrame, variantCol: String, convertedCol: String,
               control: String): DataFrame = {
    val agg = units
      .select(col(variantCol).cast("string").as("variant"),
        col(convertedCol).cast("long").as("cv"))
      .withColumn("cv", when(col("cv") === 0L || col("cv") === 1L, col("cv"))
        .otherwise(raise_error(concat(lit(s"abReport: '$convertedCol' must " +
          "be 0/1, got "), col("cv").cast("string")))))
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("cv").as("conv"))
    val ctlRows = agg.filter(col("variant") === control)
      .select("n", "conv").collect()
    require(ctlRows.nonEmpty,
      s"abReport: control variant '$control' has no units")
    val (nCtl, convCtl) = (ctlRows.head.getLong(0), ctlRows.head.getLong(1))
    // guard per variant row (O(#variants) checks): the product is first
    // formed in DECIMAL(38,0) — exact — and compared against Long.Max
    def prod(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def d(c: org.apache.spark.sql.Column) =
        c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
      when(d(a) * d(b) > lit(Long.MaxValue),
        raise_error(lit("abReport: count product overflows Int64 — " +
          "pre-aggregate units"))).otherwise(a * b)
    }
    agg.filter(col("variant") =!= control)
      .select(col("variant"), col("n"), col("conv"),
        lit(nCtl).as("n_ctl"), lit(convCtl).as("conv_ctl"),
        prod(col("conv"), lit(nCtl)).as("rr_num"),
        prod(lit(convCtl), col("n")).as("rr_den"),
        prod(col("conv"), lit(nCtl - convCtl)).as("or_num"),
        prod(lit(convCtl), col("n") - col("conv")).as("or_den"))
      .orderBy("variant")
  }
}

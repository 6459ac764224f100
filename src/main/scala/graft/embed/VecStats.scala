package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Embedding-column profiling — the pass run before whitening /
  * normalization / quantizer training: per-dimension count, sum, sum of
  * squares, min and max over fixed-point QUANTIZED values (⌊v·scale⌋ —
  * float→double widening is exact and IEEE double multiply+floor is
  * deterministic, so the quantized stats replay cell-for-cell across
  * engines where raw float summation order would not). A zero-variance
  * dimension (min_q = max_q) is dead weight every index pays for; a
  * wildly off-center one breaks cosine assumptions — both read directly
  * off this table.
  */
object VecStats {

  /** Per-dimension stats of `vecCol` (Array[Float], all rows exactly
    * `dim` wide — a ragged row raises: silent dimension drift corrupts
    * every downstream dot product). NULL vectors are excluded. Output:
    * (dim, n, sum_q, sumsq_q, min_q, max_q), dim-ordered; sumsq is
    * accumulated in DECIMAL(38,0) and raises past Int64 on output (the
    * joinProfile guard pattern — n·q̄² beyond 9.2e18 means rescale).
    *
    * Scale shape: one posexplode (rows × dim, narrow) into one
    * map-side-combined aggregation keyed on the dimension index — the
    * exchange carries O(dim) rows per task, never the vectors. */
  def perDimStats(df: DataFrame, vecCol: String, dim: Int,
                  scale: Long = 1000000L): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    df.filter(col(vecCol).isNotNull)
      .withColumn("__v", when(size(col(vecCol)) === dim, col(vecCol))
        .otherwise(raise_error(concat(
          lit(s"perDimStats: expected $dim dims, got "),
          size(col(vecCol)).cast("string")))))
      .select(posexplode(col("__v")).as(Seq("dim", "v")))
      .select(col("dim").cast(LongType).as("dim"),
        expr(s"CAST(FLOOR(CAST(v AS DOUBLE) * ${scale}L) AS BIGINT)")
          .as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("sum_q"),
        sum(col("q").cast(DecimalType(38, 0)) *
          col("q").cast(DecimalType(38, 0))).as("__ssq"),
        min("q").as("min_q"), max("q").as("max_q"))
      .withColumn("sumsq_q", when(col("__ssq") > lit(Long.MaxValue),
        raise_error(lit("perDimStats: sum of squares overflows Int64 — " +
          "lower the scale")))
        .otherwise(col("__ssq").cast(LongType)))
      .select("dim", "n", "sum_q", "sumsq_q", "min_q", "max_q")
      .orderBy("dim")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Re-aggregatable PORTABLE distinct-count sketches — the third member
  * of the sketch family ([[QuantileSketch]] declared-domain quantiles,
  * [[LogQuantileSketch]] unknown-domain quantiles, this one distinct
  * counts). Spark's DataSketches HLL (`hll_sketch_agg`) already answers
  * the rollup pattern (SketchRollupSpec), but its state is opaque
  * engine-specific bytes: no other engine can read, merge, or verify a
  * stored sketch column. This sketch trades a little constant-factor
  * speed for PORTABILITY: the state is a plain ARRAY<BIGINT> of HLL
  * registers derived from md5 (every SQL engine's md5 agrees), the
  * merge is element-wise MAX (plain SQL), and the register state is
  * exactly replayable — the DuckDB gates pin it cell-for-cell, which no
  * opaque-bytes sketch can offer.
  *
  * Register construction (classic HLL, Flajolet et al. 2007, on a
  * 64-bit hash slice of md5(CAST(value AS STRING))): with m = 16^c
  * registers (c hex chars), bucket = value of the first c hex chars,
  * rho = 1 + the number of leading zero BITS in the next 16 hex chars
  * (a 64-bit suffix; rho ∈ [1, 65]). Register j holds MAX(rho) over
  * the values hashing to bucket j — a commutative idempotent monoid
  * under element-wise max, so the cube contract is EXACT on the state:
  *
  *   registers(A ∪ B) == merge(registers(A), registers(B))   (cell-for-cell)
  *
  * in any grouping/order/duplication — duplicates are absorbed by MAX,
  * which is what makes it a DISTINCT sketch. The approximation lives
  * only in the [[estimate]] read (harmonic-mean estimator with the
  * standard small-range linear-counting correction; rsd ≈ 1.04/√m —
  * 6.5% at the default m = 256).
  *
  * Scale shape: [[sketch]] is ONE map-side-combined hash aggregation of
  * m conditional MAXes (whole-stage codegen, no UDAF; the exchange per
  * group is one fixed-width Long vector, never values); [[rollup]]
  * re-aggregates stored sketches the same way; [[merge]] is a
  * `zip_with` greatest; [[estimate]] is a higher-order-function fold
  * over the (small, fixed-size) array. m is capped at 256 (c ≤ 2) so
  * the widest aggregate stays comfortably inside codegen.
  */
object DistinctSketch {

  /** Registers for `hexChars` bucket characters: m = 16^hexChars. */
  def m(hexChars: Int): Int = {
    require(hexChars >= 1 && hexChars <= 2,
      s"hexChars must be 1 (m=16, toy) or 2 (m=256), got $hexChars")
    1 << (4 * hexChars)
  }

  /** (bucket, rho) columns derived from a value column — the shared
    * hash slice both the Spark side and any SQL replay compute
    * identically: md5 of the value's canonical STRING form, first
    * `hexChars` chars as the bucket, leading-zero bits of the next 16
    * chars (+1) as rho. The hex-char arithmetic (base-16 `conv`, ltrim
    * zero-count, lexicographic nibble compare — '0'<'1'<…<'9'<'a'<…<'f'
    * holds in every ASCII collation) replays in plain SQL on any
    * engine. */
  private def bucketRho(v: Column, hexChars: Int): (Column, Column) = {
    val h = md5(v.cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, hexChars), 16, 10).cast(LongType)
    val suffix = substring(h, hexChars + 1, 16)
    val trimmed = ltrim(suffix, "0")
    val zeros = lit(16) - length(trimmed)
    val nib = substring(trimmed, 1, 1)
    val lead = when(nib >= "8", 0).when(nib >= "4", 1)
      .when(nib >= "2", 2).otherwise(3)
    val rho = when(length(trimmed) === 0, lit(65L))
      .otherwise((zeros * 4 + lead + 1).cast(LongType))
    (bucket, rho)
  }

  /** One sketch per `groupCols` cell (global when empty) over `valueCol`
    * (any type with a canonical string form — BIGINT/STRING/DATE; NULL
    * values are ignored, they name no distinct member). Output:
    * groupCols..., `out` ARRAY<BIGINT> of length m (register j at
    * element j+1; 0 = bucket never hit). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             hexChars: Int = 2, out: String = "sketch"): DataFrame = {
    val mm = m(hexChars)
    (groupCols :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
    val (bucket, rho) = bucketRho(col(valueCol), hexChars)
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__ds_b", bucket)
      .withColumn("__ds_r", rho)
    // coalesce twice: max over zero rows is NULL (empty global sketch ->
    // all-zero registers), and max of a never-hit bucket is NULL too
    val aggs = (0 until mm).map(j =>
      coalesce(max(when(col("__ds_b") === j, col("__ds_r"))), lit(0L))
        .as(s"__ds_m$j"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until mm).map(j => col(s"__ds_m$j")): _*).as(out): _*)
  }

  /** Element-wise max of two register arrays (same m by contract) — the
    * ⊕ of the cube contract; idempotent, so re-merging a sketch with
    * itself is a no-op (distinct semantics). */
  def merge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => greatest(x, y))

  /** The SPARSE form of [[sketch]] (groupCols..., slot = register index,
    * r = register value — never-hit registers absent): the streaming
    * maintainer's segment form, O(hit registers) rows instead of
    * O(keys · m) dense arrays. Same bucket/rho arithmetic; the monoid on
    * sparse rows is slot-wise MAX (idempotent, like the dense merge);
    * [[graft.operators.CountMinSketch.assembleSparse]] densifies
    * (absent registers read 0). */
  private[graft] def sketchSparse(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String,
                                  hexChars: Int = 2): DataFrame = {
    m(hexChars)
    val (bucket, rho) = bucketRho(col(valueCol), hexChars)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(bucket.as("slot"), rho.as("r")): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(max("r").as("r"))
  }

  /** Re-aggregates a stored sketch column to coarser `groupCols` cells
    * (global when empty): the cube rollup, touching only the register
    * vectors — never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, hexChars: Int,
             groupCols: Seq[String]): DataFrame = {
    val mm = m(hexChars)
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    // the QuantileSketch.rollup guard: a mismatched m would silently
    // truncate or NULL-fill registers — wrong sketches, not an error
    val sk = when(size(col(sketchCol)) === mm, col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: sketch array length %s != $mm (16^$hexChars registers) " +
          "— hexChars must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    val aggs = (0 until mm).map(j =>
      coalesce(max(element_at(sk, j + 1)), lit(0L)).as(s"__ds_m$j"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until mm).map(j => col(s"__ds_m$j")): _*).as(sketchCol): _*)
  }

  /** Distinct-count estimate read from a register array (BIGINT,
    * rounded): the classic harmonic-mean HLL estimator
    * α·m²/Σ 2^(−M_j) with the small-range correction — when the raw
    * estimate is ≤ 2.5m and empty registers remain, linear counting
    * m·ln(m/V) is the better estimator (and makes small counts near
    * exact: an empty sketch reads 0, a single value reads 1). rsd ≈
    * 1.04/√m. The fold is a deterministic left-to-right HOF over the
    * fixed-size array — same registers, same estimate, every engine. */
  def estimate(sk: Column, hexChars: Int): Column = {
    val mm = m(hexChars).toDouble
    val ind = aggregate(sk, lit(0.0),
      (a, r) => a + pow(lit(2.0), -r.cast("double")))
    val v = aggregate(sk, lit(0L), (a, r) => a + when(r === 0L, 1L).otherwise(0L))
    val alpha =
      if (m(hexChars) == 16) 0.673 else 0.7213 / (1.0 + 1.079 / mm)
    val raw = lit(alpha * mm * mm) / ind
    when(raw <= 2.5 * mm && v > 0L,
        round(lit(mm) * log(lit(mm) / v.cast("double"))).cast(LongType))
      .otherwise(round(raw).cast(LongType))
  }

  /** Intersection-cardinality estimate for two sketches over the same
    * value domain, by inclusion-exclusion on the union sketch:
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) (the union estimate is the
    * merged sketch's — exact state, no extra pass over data). Floored
    * at 0: estimator noise can push a near-disjoint pair negative.
    * Error grows with |A∪B|/|A∩B| (both operand errors add), so treat
    * small intersections of huge sets as "≈ 0", not as precise — the
    * standard inclusion-exclusion caveat. */
  def estimateIntersection(a: Column, b: Column, hexChars: Int): Column =
    greatest(lit(0L),
      estimate(a, hexChars) + estimate(b, hexChars) -
        estimate(merge(a, b), hexChars))

  /** One-call sketch → estimate read-back (the SQL TVF shape):
    * groupCols..., n_est, ordered by the group columns. */
  def summary(df: DataFrame, groupCols: Seq[String], valueCol: String,
              hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, hexChars)
    val out = sk.select(groupCols.map(col) :+
      estimate(col("sketch"), hexChars).as("n_est"): _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  /** The oracle-facing exact form: non-zero registers as (groupCols...,
    * bucket, r) rows, ordered — what a cross-engine SQL replay pins
    * cell-for-cell (the estimate is approximate by nature and
    * spec-gated; the STATE is exact and oracle-gated). */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, hexChars)
    sk.select(groupCols.map(col) :+ posexplode(col("sketch")): _*)
      .filter(col("col") > 0L)
      .select(groupCols.map(col) ++ Seq(col("pos").cast(LongType).as("bucket"),
        col("col").as("r")): _*)
      .orderBy((groupCols :+ "bucket").map(col): _*)
  }
}

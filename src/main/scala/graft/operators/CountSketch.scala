package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Re-aggregatable PORTABLE signed frequency sketches — the AMS /
  * count-sketch (Alon-Matias-Szegedy 1996 "tug-of-war" with the
  * Charikar-Chen-Farach-Colton 2002 hashed layout), the sixth sketch
  * family member: [[QuantileSketch]]/[[LogQuantileSketch]] quantiles,
  * [[DistinctSketch]] distinct counts, [[CountMinSketch]] frequency
  * UPPER bounds, [[KmvSketch]] set operations, and this one UNBIASED
  * second-moment reads: point frequencies, F2 (self-join size), and
  * cross-join size. The CMS inner product ([[CountMinSketch
  * .estimateJoinSize]], the r15 join planner's input) NEVER
  * under-estimates — the safety property a join planner wants — but
  * over-estimates by ε·W_A·W_B; the count-sketch dot product is
  * UNBIASED with variance ≈ 2·F2(A)·F2(B)/width per row, median over
  * the depth rows — the cardinality-ANALYSIS read (skew diagnosis,
  * estimate refinement) beside the planner's safe bound. [[graft
  * .operators.Salted.autoJoin]] keeps consuming the CMS bound; this
  * sketch answers "how big actually", not "how big at most".
  *
  * Same portability contract as the siblings: the state is a plain
  * ARRAY<BIGINT> of depth×width SIGNED counters derived from md5
  * (every SQL engine's md5 agrees), the merge is element-wise ADD, and
  * the reads are INTEGER arithmetic end-to-end (signed dot products,
  * median = middle of an odd-length sort) — so the estimates are
  * oracle-gated cell-for-cell like the KMV reads, which no
  * variance-bearing sketch with float reads could offer.
  *
  * Counter construction: md5 of the value's canonical STRING form
  * yields 32 hex chars; depth row i ∈ [0, d) buckets the 16-bit slice
  * at offset 4·i `mod width` (exactly [[CountMinSketch]]'s bucket) and
  * signs the row ±1 by the PARITY of hex char 21+i (a bit disjoint
  * from every bucket slice, so sign and bucket are independent).
  * Counter (i, j) accumulates SUM(sign·weight) — a commutative monoid
  * under element-wise ADDITION (0 is the true additive identity:
  * never-hit and cancelled-out read the same, correctly), so the cube
  * contract is EXACT on the state:
  *
  *   counters(A ⊎ B) == merge(counters(A), counters(B))  (cell-for-cell)
  *
  * in any grouping/order. Multiset semantics: duplicates ADD, so
  * at-least-once delivery needs upstream dedup (the [[CountMinSketch]]
  * caveat, not the [[DistinctSketch]]/[[KmvSketch]] idempotence).
  *
  * Scale shape: the [[CountMinSketch]] sparse lesson applied from the
  * start — [[sketch]] explodes each row to its d (slot, ±w) hits, ONE
  * map-side-combined (group, slot) sum (exchange ≤ depth·width narrow
  * rows per group, never values), bounded collect_list assembly;
  * [[rollup]] re-aggregates via posexplode + the same sparse path;
  * reads fold the fixed-size array with exact DECIMAL accumulation
  * (a counter square reaches W² — past Int64 for W > 3·10^9 — so the
  * fold carries DECIMAL(38,0) and the caller casts the read down).
  */
object CountSketch {

  /** Total counter slots for a (depth, width) sketch, validating the
    * shape: depth ODD in [1, 5] (reads take the median of depth
    * estimates — odd keeps it the exact middle element; bucket slices
    * use hex chars 1..4d ≤ 20 and signs use chars 22..26, disjoint),
    * width a power of two in [2, 65536], depth×width ≤ 1024 (the
    * family's state-width cap). */
  def slots(depth: Int, width: Int): Int = {
    require(depth >= 1 && depth <= 5 && depth % 2 == 1,
      s"depth must be odd in [1, 5], got $depth")
    require(width >= 2 && width <= 65536 && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 65536], got $width")
    require(depth * width <= 1024,
      s"depth*width must be <= 1024 (codegen cap), got ${depth * width}")
    depth * width
  }

  /** The depth-row-i bucket: hex chars [4i+1, 4i+4] of md5 as a 16-bit
    * integer, mod width (DuckDB: `('0x' || substr(md5(v), 4*i+1, 4))
    * ::BIGINT % width`). */
  private def bucket(h: Column, i: Int, width: Int): Column =
    conv(substring(h, 4 * i + 1, 4), 16, 10).cast(LongType) % width

  /** The depth-row-i sign ∈ {−1, +1}: parity of hex char 21+i
    * (1-indexed char 22+i in substring terms... char position 21+i+1),
    * i.e. `1 − 2·(nibble % 2)` (DuckDB: `1 - 2*(('0x' ||
    * substr(md5(v), 22+i, 1))::BIGINT % 2)`). */
  private def sign(h: Column, i: Int): Column =
    lit(1L) - lit(2L) * (conv(substring(h, 22 + i, 1), 16, 10)
      .cast(LongType) % 2)

  /** One sketch per `groupCols` cell (global when empty) over `valueCol`
    * (any type with a canonical string form; NULLs ignored). Output:
    * groupCols..., `out` ARRAY<BIGINT> of length depth·width (counter
    * (i,j) at element i·width+j+1). With `weightCol` (non-negative
    * BIGINT; NULL/negative RAISES — the family contract) each hit adds
    * sign·weight. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             depth: Int = 5, width: Int = 128, out: String = "sketch",
             weightCol: Option[String] = None): DataFrame = {
    val total = slots(depth, width)
    (groupCols ++ weightCol :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
    weightCol.foreach(c => require(df.schema(c).dataType == LongType,
      s"$c must be BIGINT"))
    val wexpr = weightCol match {
      case None => lit(1L)
      case Some(c) => when(col(c).isNull || col(c) < 0L, raise_error(
          format_string(s"sketch: weight '$c' must be a non-negative " +
            "BIGINT, got %s", coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c))
    }
    val h = md5(col(valueCol).cast("string").cast("binary"))
    val hits = array((0 until depth).map(i => struct(
      (lit(i.toLong * width) + bucket(h, i, width)).as("slot"),
      sign(h, i).as("sgn"))): _*)
    val sparse = df.filter(col(valueCol).isNotNull)
      .withColumn("__cs_w", wexpr)
      .select(groupCols.map(col) :+ col("__cs_w") :+
        explode(hits).as("__cs_h"): _*)
      .select(groupCols.map(col) ++ Seq(col("__cs_h.slot").as("__cs_s"),
        (col("__cs_h.sgn") * col("__cs_w")).as("__cs_sw")): _*)
      .groupBy((groupCols :+ "__cs_s").map(col): _*)
      .agg(sum("__cs_sw").as("__cs_c"))
    CountMinSketch.assembleSparse(sparse, groupCols, "__cs_s", "__cs_c",
      total, out)
  }

  /** The SPARSE stage of [[sketch]] exposed (groupCols..., slot, c —
    * zero counters absent): the streaming maintainer's segment form,
    * O(rows-with-hits) instead of O(keys · depth·width) dense arrays.
    * Same counters, same signed-ADD monoid on the sparse rows (a slot
    * folding to 0 is the additive identity — dropping it at any stage
    * is exact, unlike a min/max sketch's sentinel). */
  private[graft] def sketchSparse(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String, depth: Int,
                                  width: Int): DataFrame = {
    slots(depth, width)
    val h = md5(col(valueCol).cast("string").cast("binary"))
    val hits = array((0 until depth).map(i => struct(
      (lit(i.toLong * width) + bucket(h, i, width)).as("slot"),
      sign(h, i).as("sgn"))): _*)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ explode(hits).as("__cs_h"): _*)
      .select(groupCols.map(col) ++ Seq(col("__cs_h.slot").as("slot"),
        col("__cs_h.sgn").as("sgn")): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(sum("sgn").as("c"))
  }

  /** Element-wise sum of two counter arrays (same depth·width by
    * contract) — the ⊕ of the cube contract. */
  def merge(a: Column, b: Column): Column = zip_with(a, b, _ + _)

  /** Re-aggregates a stored sketch column to coarser `groupCols` cells
    * (global when empty): the cube rollup, touching only the counter
    * vectors — never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, depth: Int, width: Int,
             groupCols: Seq[String]): DataFrame = {
    val total = slots(depth, width)
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    val sk = when(size(col(sketchCol)) === total, col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: sketch array length %s != $total (depth $depth × " +
          s"width $width) — shape must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    val sparse = df
      .select(groupCols.map(col) :+ posexplode(sk).as(Seq("__cs_s", "__cs_c")): _*)
      .groupBy((groupCols :+ "__cs_s").map(col): _*)
      .agg(sum("__cs_c").as("__cs_c"))
    CountMinSketch.assembleSparse(sparse, groupCols, "__cs_s", "__cs_c",
      total, sketchCol)
  }

  /** The median of an odd-length array of DECIMAL estimates: sort, take
    * the exact middle — integer-exact and engine-portable (no float
    * averaging of middle pairs; depth is required odd). */
  private def medianOdd(arr: Column, depth: Int): Column =
    element_at(array_sort(arr), (depth + 1) / 2)

  /** Per-row-i signed dot product of two sketches over row i's width
    * counters, as DECIMAL(38,0) — exact (a product reaches W_A·W_B). */
  private def rowDot(a: Column, b: Column, i: Int, width: Int): Column = {
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))
    val sa = slice(a, i * width + 1, width)
    val sb = slice(b, i * width + 1, width)
    aggregate(zip_with(sa, sb, (x, y) =>
        x.cast(DecimalType(19, 0)) * y.cast(DecimalType(19, 0))),
      zero, (acc, p) => acc + p)
  }

  /** UNBIASED point-frequency estimate of `v` from a sketch: median
    * over the depth rows of sign_i(v)·counter(i, bucket_i(v)). Unlike
    * [[CountMinSketch.estimate]] it can under-read (and even read
    * negative on small sketches) but is centered on the truth; stderr
    * ≈ √(F2/width) per row before the median. Integer-exact. */
  def pointEstimate(sk: Column, v: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    val h = md5(v.cast("string").cast("binary"))
    val ests = array((0 until depth).map(i =>
      sign(h, i) * element_at(sk,
        (lit(i.toLong * width) + bucket(h, i, width) + 1L).cast("int"))): _*)
    element_at(array_sort(ests), (depth + 1) / 2)
  }

  /** UNBIASED second-moment (F2 = Σ_v f_v² = self-join size) read:
    * median over the depth rows of Σ_j counter(i,j)². DECIMAL(38,0) —
    * cast down at the call site when the domain bounds it. */
  def estimateF2(sk: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    medianOdd(array((0 until depth).map(i => rowDot(sk, sk, i, width)): _*),
      depth)
  }

  /** UNBIASED join-size estimate |A ⋈ B| = Σ_v fA(v)·fB(v): median over
    * the depth rows of the signed counter dot product. The unbiased
    * refinement of [[CountMinSketch.estimateJoinSize]]'s never-under
    * bound; floored at 0 (a near-empty true join can median slightly
    * negative). DECIMAL(38,0). */
  def estimateJoinSize(a: Column, b: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))
    greatest(zero,
      medianOdd(array((0 until depth).map(i => rowDot(a, b, i, width)): _*),
        depth))
  }

  /** The oracle-facing exact form: non-zero counters as (groupCols...,
    * slot, c) rows, ordered — what a cross-engine SQL replay pins
    * cell-for-cell. (A counter that sums to zero reads as never-hit —
    * the additive identity, correct by construction.) */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                depth: Int = 5, width: Int = 128): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, depth, width)
    sk.select(groupCols.map(col) :+ posexplode(col("sketch")): _*)
      .filter(col("col") =!= 0L)
      .select(groupCols.map(col) ++ Seq(col("pos").cast(LongType).as("slot"),
        col("col").as("c")): _*)
      .orderBy((groupCols :+ "slot").map(col): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Re-aggregatable PORTABLE set-operation sketches — the fifth member
  * of the sketch family ([[QuantileSketch]] declared-domain quantiles,
  * [[LogQuantileSketch]] unknown-domain quantiles, [[DistinctSketch]]
  * distinct counts, [[CountMinSketch]] frequency upper bounds, this
  * one SET EXPRESSIONS). The HLL sketch's
  * intersection read is inclusion-exclusion on three estimates
  * ([[DistinctSketch.estimateIntersection]]) — both operand errors add,
  * so a small intersection of two huge sets is noise. This sketch keeps
  * per-bucket MINIMUM hashes (bottom-1-per-bucket KMV, i.e. m
  * independent MinHash registers with stochastic averaging — Beyer et
  * al. 2007, Broder 1997), which SAMPLE the union: two sketches agree
  * on a register exactly when the union's smallest member in that
  * bucket lies in both sets, so Jaccard is estimated DIRECTLY
  * (matches/hits, rsd ≈ √(J(1−J)/m)) and |A∩B| = Ĵ·|A∪B| inherits the
  * union's relative error instead of the operands' absolute errors.
  * Same portability contract as the siblings: the state is a plain
  * ARRAY<BIGINT> derived from md5 (every SQL engine's md5 agrees), the
  * merge is element-wise MIN (plain SQL), and both the registers AND
  * the set-operation reads are exactly replayable — the reads are
  * RATIONAL arithmetic (exact integer sums + IEEE division/floor, no
  * transcendentals), so unlike the HLL estimate they are oracle-gated
  * cell-for-cell, not just spec-gated.
  *
  * Register construction: with m = 16^c buckets (c hex chars) over
  * hx = md5(CAST(value AS STRING)), bucket = value of the first c hex
  * chars, suffix s = the next 12 hex chars as a 48-bit integer
  * (s ∈ [0, 2^48)). Register j holds 1 + MIN(s) over the values
  * hashing to bucket j — the +1 makes 0 an unambiguous "never hit"
  * sentinel (a real suffix of 0 stores 1). Element-wise min (0 absorbs
  * nothing: it means empty, not small) is a commutative IDEMPOTENT
  * monoid, so the cube contract is EXACT on the state:
  *
  *   registers(A ∪ B) == merge(registers(A), registers(B))  (cell-for-cell)
  *
  * in any grouping/order/duplication — duplicates are absorbed by MIN,
  * which is what makes it a sketch of the SET.
  *
  * Reads (all deterministic given the registers):
  *  - Σ(sk) = Σ_j (r_j − 1 if hit else D), D = 2^48 — an EXACT BIGINT
  *    (≤ m·D = 2^56 at m = 256, no overflow). With per-bucket counts
  *    N_j ~ Poisson(λ), λ = n/m: E[u_j] = E[1/(N_j+1)] = (1−e^(−λ))/λ
  *    (the empty bucket contributes u = 1, i.e. D) and E[hits] =
  *    m·(1−e^(−λ)), so the MOMENT-MATCHED estimator λ̂ = hits/Σu gives
  *    n̂ = m·hits·D/Σ — consistent across ALL regimes (n ≪ m included:
  *    no HLL-style linear-counting switch needed; exactly 0 on the
  *    empty sketch, exactly 1 on a single value after the half-up
  *    round). One exact-integer product and one IEEE division; rsd ≈
  *    1/√m ≈ 6.5% at m = 256.
  *  - matches(A,B) = #{j : A_j = B_j ≠ 0}, hits(U) = #{j : U_j ≠ 0} —
  *    exact integers; Ĵ = matches/hits (unbiased for J conditional on
  *    the bucket being hit), |A∩B| ≈ Ĵ·n̂(A∪B), |A∖B| ≈ n̂(A∪B) − n̂(B).
  *
  * Scale shape (same as the siblings): [[sketch]] is ONE map-side-
  * combined hash aggregation of m conditional MINs (whole-stage
  * codegen, no UDAF; the exchange per group is one fixed-width Long
  * vector, never values); [[rollup]] re-aggregates stored sketches;
  * [[merge]] is a `zip_with`; every read is a higher-order-function
  * fold over the fixed-size array. m is capped at 256 (c ≤ 2) so the
  * widest aggregate stays comfortably inside codegen.
  */
object KmvSketch {

  /** Suffix domain: 12 hex chars = 48 bits. Stored registers are
    * s + 1 ∈ [1, D]; 0 = never hit. */
  val D: Long = 1L << 48

  /** Registers for `hexChars` bucket characters: m = 16^hexChars. */
  def m(hexChars: Int): Int = {
    require(hexChars >= 1 && hexChars <= 2,
      s"hexChars must be 1 (m=16, toy) or 2 (m=256), got $hexChars")
    1 << (4 * hexChars)
  }

  /** (bucket, 1 + 48-bit suffix) columns — the shared hash slice both
    * the Spark side and any SQL replay compute identically: md5 of the
    * value's canonical STRING form, first `hexChars` chars as the
    * bucket, the next 12 chars as a base-16 integer (a 12-term nibble
    * polynomial in engines without base-16 conv). */
  private def bucketMin(v: Column, hexChars: Int): (Column, Column) = {
    val h = md5(v.cast("string").cast("binary"))
    val bucket = conv(substring(h, 1, hexChars), 16, 10).cast(LongType)
    val r = conv(substring(h, hexChars + 1, 12), 16, 10).cast(LongType) + 1L
    (bucket, r)
  }

  /** One sketch per `groupCols` cell (global when empty) over `valueCol`
    * (any type with a canonical string form; NULLs are ignored — they
    * name no set member). Output: groupCols..., `out` ARRAY<BIGINT> of
    * length m (register j at element j+1; 0 = bucket never hit). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             hexChars: Int = 2, out: String = "kmv"): DataFrame = {
    val mm = m(hexChars)
    (groupCols :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
    val (bucket, r) = bucketMin(col(valueCol), hexChars)
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__kv_b", bucket)
      .withColumn("__kv_r", r)
    // coalesce twice: min over zero rows is NULL (empty global sketch ->
    // all-zero registers), and min of a never-hit bucket is NULL too
    val aggs = (0 until mm).map(j =>
      coalesce(min(when(col("__kv_b") === j, col("__kv_r"))), lit(0L))
        .as(s"__kv_m$j"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until mm).map(j => col(s"__kv_m$j")): _*).as(out): _*)
  }

  /** The SPARSE form of [[sketch]] (groupCols..., slot = register index,
    * r — never-hit registers absent): the streaming maintainer's segment
    * form. The monoid on sparse rows is slot-wise MIN (no sentinel in
    * play — absent IS the sentinel); idempotent, so re-delivered values
    * are absorbed. [[CountMinSketch.assembleSparse]] densifies (absent
    * registers read 0 — exactly this sketch's sentinel). */
  private[graft] def sketchSparse(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String,
                                  hexChars: Int = 2): DataFrame = {
    m(hexChars)
    val (bucket, r) = bucketMin(col(valueCol), hexChars)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(bucket.as("slot"), r.as("r")): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(min("r").as("r"))
  }

  /** Element-wise min of two register arrays (same m by contract),
    * treating the 0 sentinel as +∞ — the ⊕ of the cube contract;
    * idempotent, so re-merging a sketch with itself is a no-op. */
  def merge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) =>
      when(x === 0L, y).when(y === 0L, x).otherwise(least(x, y)))

  /** Re-aggregates a stored sketch column to coarser `groupCols` cells
    * (global when empty): the cube rollup, touching only the register
    * vectors — never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, hexChars: Int,
             groupCols: Seq[String]): DataFrame = {
    val mm = m(hexChars)
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    // the family's rollup guard: a mismatched m would silently truncate
    // or NULL-fill registers — wrong sketches, not an error
    val sk = when(size(col(sketchCol)) === mm, col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: sketch array length %s != $mm (16^$hexChars registers) " +
          "— hexChars must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    // min over the HIT registers only (0 = never hit, not small)
    val aggs = (0 until mm).map(j =>
      coalesce(min(when(element_at(sk, j + 1) > 0L, element_at(sk, j + 1))),
        lit(0L)).as(s"__kv_m$j"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until mm).map(j => col(s"__kv_m$j")): _*).as(sketchCol): _*)
  }

  /** Σ_j (r_j − 1 if hit else D) — the EXACT BIGINT the rational
    * estimator reads (≤ m·D = 2^56 at m = 256; no overflow, no
    * floats until the final division). */
  def sigma(sk: Column): Column =
    aggregate(sk, lit(0L),
      (a, r) => a + when(r === 0L, lit(D)).otherwise(r - 1L))

  /** Number of hit registers — exact. */
  def hits(sk: Column): Column =
    aggregate(sk, lit(0L), (a, r) => a + when(r > 0L, 1L).otherwise(0L))

  /** Number of registers where both sketches are hit AND agree — the
    * MinHash match count, exact. */
  def matches(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => when(x > 0L && x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)

  /** The rational estimate as a DOUBLE, pre-round: m·hits·D/Σ (the
    * moment-matched λ̂ = hits/Σu — see the header). Every input is an
    * exact integer cast to DOUBLE (IEEE round-to-nearest — identical in
    * every engine) and the expression is one multiply and one divide —
    * bit-deterministic, which is what lets the floored reads be
    * oracle-gated. Σ = 0 (all m registers hit by suffix 0 —
    * probability 2^(−48·m)) is guarded to avoid a division by zero. */
  private def rational(sk: Column, hexChars: Int): Column = {
    val s = greatest(sigma(sk), lit(1L)).cast("double")
    hits(sk).cast("double") * lit(m(hexChars).toDouble * D.toDouble) / s
  }

  /** Oracle-gated distinct estimate: the rational estimator rounded
    * half-up via FLOOR(x + 0.5) — floor is the one rounding primitive
    * every engine agrees on, and the explicit +0.5 sidesteps
    * half-to-even vs half-away divergence. Exactly 0 on the empty
    * sketch, exactly 1 on a single value. */
  def estimateRational(sk: Column, hexChars: Int): Column =
    floor(rational(sk, hexChars) + lit(0.5)).cast(LongType)

  /** Production distinct estimate — the moment-matched estimator is
    * consistent across all cardinality regimes (no small-range switch),
    * so the production read IS the cross-engine rational read. */
  def estimate(sk: Column, hexChars: Int): Column =
    estimateRational(sk, hexChars)

  /** Jaccard estimate from two sketches over the same value domain:
    * matches / hits-of-union (0.0 when the union is empty). Unbiased
    * for J conditional on a bucket being hit; rsd ≈ √(J(1−J)/m). One
    * exact-integer division — oracle-replayable. */
  def jaccard(a: Column, b: Column, hexChars: Int): Column = {
    val u = merge(a, b)
    val h = hits(u)
    when(h === 0L, lit(0.0))
      .otherwise(matches(a, b).cast("double") / h.cast("double"))
  }

  /** Intersection-cardinality estimate: Ĵ · n̂(A∪B), floored. Unlike
    * the HLL inclusion-exclusion read the error scales with the UNION
    * estimate times the Jaccard sampling error — a small intersection
    * of huge sets degrades gracefully instead of drowning. */
  def estimateIntersection(a: Column, b: Column, hexChars: Int): Column =
    floor(jaccard(a, b, hexChars) * rational(merge(a, b), hexChars)
      + lit(0.5)).cast(LongType)

  /** Difference-cardinality estimate |A∖B| ≈ n̂(A∪B) − n̂(B), floored
    * at 0 (estimator noise can push a subset pair negative). */
  def estimateDifference(a: Column, b: Column, hexChars: Int): Column =
    greatest(lit(0L),
      floor(rational(merge(a, b), hexChars) - rational(b, hexChars)
        + lit(0.5)).cast(LongType))

  /** Three-way register agreement #{j : A_j = B_j = C_j ≠ 0} — the
    * register samples the 3-way union's minimum, so agreement means
    * that member lies in ALL three sets; with [[hits]] of the 3-way
    * merge it reads J₃ = |A∩B∩C|/|A∪B∪C| the same way the pairwise
    * form does. Exact integer. */
  def matches3(a: Column, b: Column, c: Column): Column =
    aggregate(
      zip_with(
        zip_with(a, b, (x, y) =>
          when(x > 0L && x === y, x).otherwise(lit(0L))),
        c, (xy, z) => when(xy > 0L && xy === z, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)

  /** Three-way intersection estimate |A∩B∩C| ≈ Ĵ₃·n̂(A∪B∪C) — the set
    * expression inclusion-exclusion needs SEVEN estimates for (and
    * where its errors add); here it is one ratio of exact integers
    * times the union estimate, same error shape as the pairwise read.
    * Half-up floored like the family's other reads. */
  def estimateIntersection3(a: Column, b: Column, c: Column,
                            hexChars: Int): Column = {
    val u = merge(merge(a, b), c)
    val h = hits(u)
    val j3 = when(h === 0L, lit(0.0))
      .otherwise(matches3(a, b, c).cast("double") / h.cast("double"))
    floor(j3 * rational(u, hexChars) + lit(0.5)).cast(LongType)
  }

  /** Containment read ⌊1000·|A∩B|/|B|⌋ — "what share of set B does A
    * cover", the decontamination-triage question (B = benchmark grams,
    * A = a source's grams). Same rational ingredients as
    * [[estimateIntersection]] divided by B's rational estimate, so the
    * read stays oracle-replayable; estimator noise can push a full
    * cover slightly past 1000 (documented, not clamped). 0 when B
    * reads empty. */
  def containmentPermille(a: Column, b: Column, hexChars: Int): Column = {
    val rawB = rational(b, hexChars)
    // the RATIO divides first: when A's sketch equals B's, raw_u/raw_b
    // is EXACTLY 1.0 (x/x) and the read is exactly 1000 — multiplying
    // before dividing would round 1000·x away from a clean cancel
    when(rawB > 0.0,
        floor(lit(1000.0) * jaccard(a, b, hexChars) *
          (rational(merge(a, b), hexChars) / rawB) + lit(0.5)).cast(LongType))
      .otherwise(lit(0L))
  }

  /** One-call sketch → estimate read-back (the SQL TVF shape):
    * groupCols..., n_est, ordered by the group columns. */
  def summary(df: DataFrame, groupCols: Seq[String], valueCol: String,
              hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, hexChars)
    val out = sk.select(groupCols.map(col) :+
      estimate(col("kmv"), hexChars).as("n_est"): _*)
    if (groupCols.isEmpty) out else out.orderBy(groupCols.map(col): _*)
  }

  /** The oracle-facing exact form: hit registers as (groupCols...,
    * bucket, r) rows, ordered — what a cross-engine SQL replay pins
    * cell-for-cell. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, hexChars)
    sk.select(groupCols.map(col) :+ posexplode(col("kmv")): _*)
      .filter(col("col") > 0L)
      .select(groupCols.map(col) ++ Seq(col("pos").cast(LongType).as("bucket"),
        col("col").as("r")): _*)
      .orderBy((groupCols :+ "bucket").map(col): _*)
  }

  /** All set-operation reads for every unordered pair of `keyCol` cells
    * (key_a < key_b): exact integers (matches, hits) plus the
    * oracle-replayable floored estimates (union, intersection, A∖B,
    * B∖A) and the Jaccard double. Touches only the m-wide sketch
    * vectors — one sketch pass over the rows, then a (tiny) sketch×
    * sketch self-join on the key inequality; never the raw rows
    * pairwise. */
  /** Three-way set-operation reads for every unordered TRIPLE of
    * `keyCol` cells (key_a < key_b < key_c): the exact 3-way register
    * agreement and hit counts plus the union and triple-intersection
    * estimates — one ratio of exact integers per read, where
    * inclusion-exclusion would compound SEVEN estimates' errors. Same
    * scale shape as [[setops]]: sketches once, then a broadcast
    * product of O(keys) fixed-width vectors. */
  def setops3(df: DataFrame, keyCol: String, valueCol: String,
              hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, Seq(keyCol), valueCol, hexChars)
    val a = sk.select(col(keyCol).as("key_a"), col("kmv").as("__kv_a"))
    val b = sk.select(col(keyCol).as("key_b"), col("kmv").as("__kv_b"))
    val c = sk.select(col(keyCol).as("key_c"), col("kmv").as("__kv_c"))
    val u = merge(merge(col("__kv_a"), col("__kv_b")), col("__kv_c"))
    broadcast(broadcast(a).join(b, col("key_a") < col("key_b")))
      .join(c, col("key_b") < col("key_c"))
      .select(col("key_a"), col("key_b"), col("key_c"),
        matches3(col("__kv_a"), col("__kv_b"), col("__kv_c"))
          .as("matches3"),
        hits(u).as("hits"),
        estimateRational(u, hexChars).as("union_est"),
        estimateIntersection3(col("__kv_a"), col("__kv_b"), col("__kv_c"),
          hexChars).as("inter_est"))
      .orderBy("key_a", "key_b", "key_c")
  }

  def setops(df: DataFrame, keyCol: String, valueCol: String,
             hexChars: Int = 2): DataFrame = {
    val sk = sketch(df, Seq(keyCol), valueCol, hexChars)
    val a = sk.select(col(keyCol).as("key_a"), col("kmv").as("__kv_a"))
    val b = sk.select(col(keyCol).as("key_b"), col("kmv").as("__kv_b"))
    val u = merge(col("__kv_a"), col("__kv_b"))
    // a BROADCAST product of two O(keys) sketch tables on the pair
    // inequality — the q237 shape: fixed-width state, the raw rows long
    // since discarded; the hint keeps the STATIC plan a broadcast
    // nested loop (never a cartesian) regardless of size estimates
    broadcast(a).join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        matches(col("__kv_a"), col("__kv_b")).as("matches"),
        hits(u).as("hits"),
        estimateRational(u, hexChars).as("union_est"),
        estimateIntersection(col("__kv_a"), col("__kv_b"), hexChars)
          .as("inter_est"),
        estimateDifference(col("__kv_a"), col("__kv_b"), hexChars)
          .as("diff_ab_est"),
        estimateDifference(col("__kv_b"), col("__kv_a"), hexChars)
          .as("diff_ba_est"),
        jaccard(col("__kv_a"), col("__kv_b"), hexChars).as("jaccard_est"))
      .orderBy("key_a", "key_b")
  }
}

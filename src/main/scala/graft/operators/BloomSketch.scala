package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Re-aggregatable PORTABLE Bloom filters — the membership member of the
  * sketch family ([[QuantileSketch]] / [[LogQuantileSketch]] quantiles,
  * [[DistinctSketch]] distinct counts, [[CountMinSketch]] frequency
  * upper bounds, [[CountSketch]] unbiased frequencies, [[KmvSketch]]
  * set expressions, this one SET MEMBERSHIP). What none of the siblings
  * can answer is "is THIS value possibly in the set?", and the answer
  * comes with the Bloom filter's ONE-SIDED error: a clear read is
  * CERTAIN absence (no false negatives), only a hit can be wrong. That
  * asymmetry is what makes it the *sound* pre-filter for incremental
  * decontamination/dedup at corpus scale — "no bit set ⇒ provably no
  * overlap ⇒ skip the exact join" is a theorem, where the KMV triage
  * (q244) is a sampling estimate. [[graft.operators.BloomJoin]] already
  * uses Spark's built-in bloom expressions for the runtime-filter JOIN
  * pattern; that sketch is opaque engine-specific bytes. This one is the
  * portability contract the family shares: state is plain BIGINT words
  * derived from md5 (every SQL engine's md5 agrees), the merge is
  * element-wise bitwise OR (plain SQL), and both the WORDS and the
  * membership READS are exact integer arithmetic — oracle-checkable
  * cell-for-cell on any engine.
  *
  * Word layout — 63 bits per word, bits 0..62: DuckDB (and ANSI
  * engines with checked arithmetic) raise on `1::BIGINT << 63`, so the
  * portable layout never touches the sign bit and every stored word is
  * non-negative. `m = 63·numWords` bits total.
  *
  * Bit positions (Kirsch–Mitzenmacher double hashing on two disjoint
  * 60-bit md5 slices): over hx = md5(CAST(value AS STRING)),
  * h1 = hex chars 1..15, h2 = hex chars 16..30;
  *   pos_i = (h1 mod m + i · (2·(h2 mod m) + 1)) mod m,  i = 0..k−1
  * (the stride is forced odd so it is never 0 — k distinct probes
  * whenever gcd(stride, m) = 1, and deterministic in any case). All
  * intermediate values stay far below 2^63 (m ≤ 63·2^24, k ≤ 8), so
  * the arithmetic replays exactly in any engine with 64-bit integers.
  * Setting a bit: word pos div 63 |= 1 << (pos mod 63). Bitwise OR is a
  * commutative IDEMPOTENT monoid, so the cube contract is EXACT on the
  * state in any grouping/order/duplication — and an at-least-once
  * stream needs no dedup before the maintainer (the [[DistinctSketch]]
  * operational property, not the CMS's).
  *
  * Scale shape — the sparse form is PRIMARY: unlike HLL (m fixed at
  * 256 regardless of n), a Bloom filter's size must scale with the set
  * it represents, so a one-row dense array cannot be the scale path.
  * [[sketchSparse]] is ONE map-side-combined aggregation of
  * (group, slot) → bit_or(mask) rows — O(hit words) per group at ANY m
  * (millions of bits), values never reach an exchange. The dense
  * ARRAY<BIGINT> form ([[sketch]], numWords ≤ 64 so the widest
  * aggregate stays inside codegen) exists for the small-m rollup/
  * storage convenience the siblings share. Membership at scale is an
  * equi-join of probe slots against the sparse state
  * ([[graft.text.Pipeline.decontamPrefilter]] — broadcast when the
  * state is small, plain shuffle join when not), never a driver loop.
  *
  * Reads:
  *  - [[mightContain]] — all k bits set; exact integers, oracle-gated.
  *  - [[setBits]] — popcount X of the filter (bit_count agrees on
  *    every engine); exact, oracle-gated.
  *  - [[estimate]] — n̂ = −(m/k)·ln(1 − X/m), the standard fill-ratio
  *    inversion; DOUBLE with a transcendental, so spec-gated like the
  *    HLL estimate (NULL on a saturated filter).
  *  - [[fpRate]] — (X/m)^k, the instantaneous false-positive rate of
  *    THIS filter; DOUBLE, spec-gated.
  */
object BloomSketch {

  /** Usable bits per stored word (bits 0..62 — see the word-layout
    * note: the sign bit is never touched so every engine's BIGINT
    * shift/or/count agrees). */
  val wordBits = 63

  /** Dense-form cap: 64 words = 4032 bits keeps the widest dense
    * aggregate comfortably inside whole-stage codegen (the family's
    * 256-register precedent). The sparse form has no such need. */
  val denseMaxWords = 64

  /** Sparse-form cap: 2^24 words ≈ 1.06e9 bits ≈ 126 MiB of set words
    * worst case — beyond this a single filter stops being a sketch. */
  val sparseMaxWords: Int = 1 << 24

  /** Total bits m for a word count. */
  def mBits(numWords: Int): Long = wordBits.toLong * numWords

  /** Sizing helper: the (numWords, k) for an expected set of
    * `expectedN` distinct values at target false-positive rate
    * `targetFpr` — the classic optima m = −n·ln p/(ln 2)², k = (m/n)·ln 2
    * (k clamped to the engine's [1, 8]; past p ≈ 0.004 the clamp costs
    * a little precision — size m up if that matters). The caller knows
    * its corpus scale; this turns that knowledge into parameters
    * instead of a guess. */
  def sizeFor(expectedN: Long, targetFpr: Double): (Int, Int) = {
    require(expectedN >= 1, s"expectedN must be >= 1, got $expectedN")
    require(targetFpr > 0 && targetFpr < 1,
      s"targetFpr must be in (0, 1), got $targetFpr")
    val ln2 = math.log(2)
    val m = math.ceil(-expectedN * math.log(targetFpr) / (ln2 * ln2))
    val words = math.min(sparseMaxWords.toDouble,
      math.max(1.0, math.ceil(m / wordBits))).toInt
    val k = math.min(8, math.max(1,
      math.round(mBits(words).toDouble / expectedN * ln2).toInt))
    (words, k)
  }

  private def checkWords(numWords: Int, dense: Boolean): Unit = {
    require(numWords >= 1, s"numWords must be >= 1, got $numWords")
    if (dense) require(numWords <= denseMaxWords,
      s"dense form caps at $denseMaxWords words (4032 bits) to stay " +
        s"inside codegen, got $numWords — use the sparse form at this size")
    else require(numWords <= sparseMaxWords,
      s"numWords caps at $sparseMaxWords, got $numWords")
  }

  private def checkK(k: Int): Unit =
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")

  /** The two 60-bit md5 slices both the Spark side and any SQL replay
    * compute identically (the q227/q244 hex recipe: 15 hex chars parse
    * into a non-negative BIGINT on every engine). */
  private def slices(v: Column): (Column, Column) = {
    val h = md5(v.cast("string").cast("binary"))
    (conv(substring(h, 1, 15), 16, 10).cast(LongType),
      conv(substring(h, 16, 15), 16, 10).cast(LongType))
  }

  /** The k probe positions of one value as an array column —
    * pos_i = (h1m + i·stride) mod m with stride = 2·(h2 mod m) + 1. */
  private def positions(v: Column, numWords: Int, k: Int): Column = {
    val m = mBits(numWords)
    val (h1, h2) = slices(v)
    val h1m = h1 % m
    val stride = (h2 % m) * 2L + 1L
    array((0 until k).map(i => (h1m + lit(i.toLong) * stride) % m): _*)
  }

  /** (slot = pos div 63, mask = 1 << (pos mod 63)) from a position.
    * Spark's `/` is DOUBLE division; floor of it is exact here (pos <
    * 2^31 ≪ 2^53, and a rounded non-integer quotient sits ≥ 1/63 from
    * any integer — far beyond half an ulp), and floor returns LONG. */
  private def slotOf(pos: Column): Column = floor(pos / lit(wordBits.toDouble))
  private def maskOf(pos: Column): Column =
    call_function("shiftleft", lit(1L), (pos % wordBits).cast(IntegerType))

  /** The SPARSE sketch — the PRIMARY form (see the scale-shape note):
    * (groupCols..., slot = word index, w = the word) rows, words with
    * no bit set absent. One explode to k fixed-width probe rows per
    * value and ONE map-side-combined bit_or aggregation — values never
    * reach an exchange, the exchange per group is O(hit words).
    * NULL values are ignored (they name no set member). */
  def sketchSparse(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   numWords: Int, k: Int = 4): DataFrame = {
    checkWords(numWords, dense = false); checkK(k)
    (groupCols :+ valueCol).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    require(!groupCols.contains(valueCol), s"$valueCol is also a group column")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        explode(positions(col(valueCol), numWords, k)).as("__bl_p"): _*)
      .select(groupCols.map(col) ++ Seq(
        slotOf(col("__bl_p")).as("slot"),
        maskOf(col("__bl_p")).as("__bl_w")): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(bit_or(col("__bl_w")).as("w"))
  }

  /** The DENSE sketch (numWords ≤ 64): one ARRAY<BIGINT> row per
    * `groupCols` cell (global when empty), word j at element j+1, 0 =
    * no bit set. The storage/rollup convenience form the siblings
    * share; same probe arithmetic as the sparse form. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             numWords: Int, k: Int = 4, out: String = "bloom"): DataFrame = {
    checkWords(numWords, dense = true); checkK(k)
    val sparse = sketchSparse(df, groupCols, valueCol, numWords, k)
    CountMinSketch.assembleSparse(sparse, groupCols, "slot", "w",
      numWords, out)
  }

  /** Element-wise bitwise OR of two word arrays (same numWords by
    * contract) — the ⊕ of the cube contract; idempotent, so re-merging
    * a sketch with itself is a no-op (set semantics). */
  def merge(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.bitwiseOR(y))

  /** Re-aggregates a stored dense sketch column to coarser `groupCols`
    * cells (global when empty) — the cube rollup, touching only the
    * word vectors, never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, numWords: Int,
             groupCols: Seq[String]): DataFrame = {
    checkWords(numWords, dense = true)
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    // the family's rollup guard: a mismatched word count would silently
    // truncate or NULL-fill words — wrong filters, not an error
    val sk = when(size(col(sketchCol)) === numWords, col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: bloom array length %s != $numWords words " +
          "— numWords must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    val aggs = (0 until numWords).map(j =>
      coalesce(bit_or(element_at(sk, j + 1)), lit(0L)).as(s"__bl_m$j"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) :+
        array((0 until numWords).map(j => col(s"__bl_m$j")): _*)
          .as(sketchCol): _*)
  }

  /** Membership read on a DENSE sketch column: true iff all k bits of
    * `v` are set. Exact integer arithmetic (probe positions, element_at,
    * bitwise AND) — deterministic on every engine, so unlike the
    * estimate reads this one is oracle-gated. The Bloom contract:
    * `false` is CERTAIN absence; `true` may be a false positive at the
    * filter's current [[fpRate]]. */
  def mightContain(sk: Column, v: Column, numWords: Int, k: Int = 4): Column = {
    checkWords(numWords, dense = true); checkK(k)
    forall(positions(v, numWords, k), p =>
      element_at(sk, (slotOf(p) + 1L).cast(IntegerType))
        .bitwiseAND(maskOf(p)) =!= 0L)
  }

  /** Popcount X of a dense sketch — exact (bit_count of a non-negative
    * word agrees on every engine), oracle-gated. */
  def setBits(sk: Column): Column =
    aggregate(sk, lit(0L), (a, w) => a + bit_count(w).cast(LongType))

  /** Cardinality estimate from the fill ratio: n̂ = −(m/k)·ln(1 − X/m),
    * rounded to BIGINT (the HLL-estimate shape; the transcendental
    * makes it spec-gated, not oracle-gated); NULL when the filter is
    * saturated (X = m: every probe collides, the inversion diverges).
    * Exact 0 on an empty filter. */
  def estimate(sk: Column, numWords: Int, k: Int): Column = {
    checkWords(numWords, dense = true); checkK(k)
    val m = mBits(numWords).toDouble
    val x = setBits(sk).cast("double")
    when(x >= m, lit(null).cast(LongType))
      .otherwise(round(lit(-m / k) * log(lit(1.0) - x / m)).cast(LongType))
  }

  /** Instantaneous false-positive rate of THIS filter: (X/m)^k — the
    * probability a never-inserted value reads as present. DOUBLE,
    * spec-gated. */
  def fpRate(sk: Column, numWords: Int, k: Int): Column = {
    checkWords(numWords, dense = true); checkK(k)
    pow(setBits(sk).cast("double") / lit(mBits(numWords).toDouble), k)
  }

  /** The oracle-facing exact form: per-group non-zero words as
    * (groupCols..., slot, w) rows, ordered — what a cross-engine SQL
    * replay pins cell-for-cell. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                numWords: Int, k: Int = 4): DataFrame =
    sketchSparse(df, groupCols, valueCol, numWords, k)
      .orderBy((groupCols :+ "slot").map(col): _*)

  /** Membership verdicts of a PROBE table against a stored SPARSE
    * filter — the scale read ([[mightContain]] needs the dense array in
    * hand; this one meets the state in an equi-join). `state` is the
    * (slot, w) rows of ONE global filter ([[sketchSparse]] with no
    * group columns); `probes` rows carry `idCols` and `valueCol`.
    * Output: idCols..., valueCol, might_contain. A `false` is certain
    * absence (the probe row's value is provably not in the sketched
    * set); `true` at the filter's fpRate.
    *
    * Scale shape: probes explode to k fixed-width (slot, mask) rows,
    * LEFT-join the O(hit words) state on slot (broadcast by default —
    * the state of even a 10^9-bit filter is ≤ 126 MiB and typically far
    * less; pass broadcastState = false to shuffle-join a giant state),
    * and fold back with ONE map-side-combined bool AND per probe row.
    * Probe values never reach an exchange — the per-probe grouping keys
    * on the two 60-bit hash slices, fixed-width longs. */
  def containsSparse(state: DataFrame, probes: DataFrame,
                     idCols: Seq[String], valueCol: String,
                     numWords: Int, k: Int = 4,
                     broadcastState: Boolean = true): DataFrame =
    perValueHits(state, probes, idCols :+ valueCol, valueCol, numWords, k,
      broadcastState)
      .select(idCols.map(col) ++ Seq(col(valueCol),
        col("__bl_hit").as("might_contain")): _*)

  /** Per-GROUP maybe-hit counts — the exchange-lean decontamination
    * read: for each `idCols` cell, how many of its distinct values
    * might be in the sketched set. Output: idCols..., n_values (the
    * cell's distinct probe values), n_maybe (those whose k bits are all
    * set). n_maybe = 0 is the sound all-clear: NONE of the cell's
    * values is in the set, provably. Probe values are dropped from the
    * plan before the first exchange — per-value verdicts group on the
    * two full 60-bit md5 slices (collisions need a 120-bit md5-prefix
    * collision, the q244 distinctness assumption), so the exchanges
    * carry fixed-width longs only. */
  def hitCounts(state: DataFrame, probes: DataFrame,
                idCols: Seq[String], valueCol: String,
                numWords: Int, k: Int = 4,
                broadcastState: Boolean = true): DataFrame =
    perValueHits(state, probes, idCols, valueCol, numWords, k,
      broadcastState)
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_values"),
        sum(when(col("__bl_hit"), 1L).otherwise(0L)).as("n_maybe"))

  /** Shared probe→join→fold core: one row per distinct (grouping...,
    * value) with its all-k-bits verdict in `__bl_hit`. `grouping` lists
    * the OUTPUT columns to group the verdict on; the value's identity
    * travels as the two full 60-bit md5 slices (fixed-width longs), so
    * when `grouping` excludes `valueCol` the value never reaches an
    * exchange. */
  private def perValueHits(state: DataFrame, probes: DataFrame,
                           grouping: Seq[String], valueCol: String,
                           numWords: Int, k: Int,
                           broadcastState: Boolean): DataFrame = {
    checkWords(numWords, dense = false); checkK(k)
    require(state.columns.toSet == Set("slot", "w"),
      s"state must be the (slot, w) rows of one global sparse filter, " +
        s"got [${state.columns.mkString(", ")}]")
    (grouping :+ valueCol).foreach { c =>
      require(probes.columns.contains(c), s"no such probe column: $c")
      require(!c.startsWith("__"),
        s"column name '$c' collides with internal __* names")
    }
    val st0 = state.select(col("slot").as("__bl_slot"), col("w"))
    val st = if (broadcastState) broadcast(st0) else st0
    val m = mBits(numWords)
    val (h1, h2) = slices(col(valueCol))
    val keyCols = grouping.map(col) ++ Seq(col("__bl_h1"), col("__bl_h2"))
    probes.filter(col(valueCol).isNotNull)
      .select(grouping.map(col) ++ Seq(
        h1.as("__bl_h1"), h2.as("__bl_h2")): _*)
      .select(grouping.map(col) ++ Seq(col("__bl_h1"), col("__bl_h2"),
        explode(array((0 until k).map(i =>
          (col("__bl_h1") % m +
            lit(i.toLong) * ((col("__bl_h2") % m) * 2L + 1L)) % m): _*))
          .as("__bl_p")): _*)
      .withColumn("__bl_slot", slotOf(col("__bl_p")))
      .withColumn("__bl_mask", maskOf(col("__bl_p")))
      .join(st, Seq("__bl_slot"), "left")
      .withColumn("__bl_bit",
        coalesce(col("w"), lit(0L)).bitwiseAND(col("__bl_mask")) =!= 0L)
      .groupBy(keyCols: _*)
      .agg(bool_and(col("__bl_bit")).as("__bl_hit"))
  }
}

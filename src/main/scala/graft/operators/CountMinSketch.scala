package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Re-aggregatable PORTABLE frequency sketches — the fourth member of
  * the sketch family ([[QuantileSketch]] declared-domain quantiles,
  * [[LogQuantileSketch]] unknown-domain quantiles, [[DistinctSketch]]
  * distinct counts, this one per-value FREQUENCIES). The exact
  * heavy-hitter operators ([[HeavyHitters]]) answer "which values are
  * frequent" for one ad-hoc query; a cube wants per-cell state it can
  * store, ROLL UP, and probe for ANY value's approximate count later —
  * without revisiting (or even retaining) the raw rows. That is the
  * classic count-min sketch (Cormode & Muthukrishnan 2005).
  *
  * Like [[DistinctSketch]], the state is PORTABLE: a plain ARRAY<BIGINT>
  * of depth×width counters whose hash is derived from md5 (every SQL
  * engine's md5 agrees), so any engine can build, merge, and verify a
  * stored sketch — the DuckDB gates pin the counter state cell-for-cell,
  * which no opaque-bytes sketch (`count_min_sketch_agg`'s binary blobs)
  * can offer.
  *
  * Counter construction: md5 of the value's canonical STRING form yields
  * 32 hex chars; depth row i ∈ [0, d) takes the 4-hex-char (16-bit)
  * slice at offset 4·i as its hash and buckets it `mod width` (width a
  * power of two dividing 2^16, so the modulo is bias-free and replays as
  * plain integer arithmetic in any SQL engine). Counter (i, j) lives at
  * array index i·width + j and accumulates SUM(weight) (COUNT when
  * unweighted) over the values whose row-i slice lands in bucket j — a
  * commutative monoid under element-wise ADDITION, so the cube contract
  * is EXACT on the state:
  *
  *   counters(A ⊎ B) == merge(counters(A), counters(B))   (cell-for-cell)
  *
  * in any grouping/order. Multiset semantics: unlike the distinct
  * sketch's idempotent MAX, duplicates ADD — which is the point (it
  * counts), and also why at-least-once delivery DOES need dedup before
  * this sketch (the [[graft.streaming.EventStreaming.CmsStateMaintainer]]
  * doc carries the warning). The approximation lives only in the
  * [[estimate]] read: min over the d counters a value hashes to — never
  * an UNDER-count (every counter ≥ the true count), over by at most
  * ε·W with probability 1−δ where ε = e/width and δ = e^−depth (W =
  * total weight in the sketch; defaults d=4, w=128 give ε ≈ 2.1%,
  * δ ≈ 1.8%).
  *
  * Scale shape: [[sketch]] is a SPARSE two-step aggregation — explode
  * each row to its d (slot, weight) hits, ONE map-side-combined
  * (group, slot) sum (so the exchange per group is ≤ depth·width narrow
  * rows, never values), then a bounded collect_list per group assembles
  * the dense vector. Unlike the [[QuantileSketch]]/[[DistinctSketch]]
  * dense form (bins conditional aggregates in one pass), a CMS row hits
  * d buckets, and measured at d·w = 512 the 512-expression dense
  * aggregate falls out of practical codegen (13.5 s vs ~2 s on the same
  * input) — the sparse shape keeps every stage narrow and
  * codegen-friendly at any (depth, width). [[rollup]] re-aggregates
  * stored sketches via posexplode + the same sparse path; [[merge]] is
  * a `zip_with` add; [[estimate]] reads d array cells. depth×width is
  * capped at 1024 (the family's state-width cap).
  *
  * Int64 bound: counters are ANSI Long sums — a weight column whose
  * per-counter sum exceeds Long.Max fails loudly in the aggregation
  * (Spark ANSI overflow), not silently; rescale heavier weights.
  */
object CountMinSketch {

  /** Total counter slots for a (depth, width) sketch, validating the
    * shape: depth ∈ [1, 8] (md5 has 32 hex chars = 8 disjoint 16-bit
    * slices), width a power of two in [2, 65536] (so `slice mod width`
    * is exactly the low bits — bias-free and SQL-portable), and
    * depth×width ≤ 1024 (the family's codegen-width cap). */
  def slots(depth: Int, width: Int): Int = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2 && width <= 65536 && (width & (width - 1)) == 0,
      s"width must be a power of two in [2, 65536], got $width")
    require(depth * width <= 1024,
      s"depth*width must be <= 1024 (codegen cap), got ${depth * width}")
    depth * width
  }

  /** The depth-row-i bucket of a value column: hex chars [4i+1, 4i+4] of
    * md5(CAST(v AS STRING)) as a 16-bit integer, mod width. The same
    * arithmetic replays in plain SQL on any engine (DuckDB:
    * `('0x' || substr(md5(v), 4*i+1, 4))::BIGINT % width`). */
  private def bucket(v: Column, i: Int, width: Int): Column =
    conv(substring(md5(v.cast("string").cast("binary")), 4 * i + 1, 4), 16, 10)
      .cast(LongType) % width

  /** One sketch per `groupCols` cell (global when empty) over `valueCol`
    * (any type with a canonical string form; NULL values are ignored —
    * they name no countable member). Output: groupCols..., `out`
    * ARRAY<BIGINT> of length depth·width (counter (i,j) at element
    * i·width+j+1).
    *
    * With `weightCol` (non-negative BIGINT; NULL or negative RAISES —
    * silently defaulting a weight would shift every estimate, the
    * [[QuantileSketch]] contract) each counter accumulates SUM(weight):
    * the sketch answers WEIGHTED frequencies (token-weighted doc counts,
    * revenue-weighted sku counts). A count sketch IS the all-weights-1
    * case. */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             depth: Int = 4, width: Int = 128, out: String = "sketch",
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
    val hitSlots = array((0 until depth).map(i =>
      lit(i.toLong * width) + bucket(col(valueCol), i, width)): _*)
    val sparse = df.filter(col(valueCol).isNotNull)
      .withColumn("__cm_w", wexpr)
      .select(groupCols.map(col) :+ col("__cm_w") :+
        explode(hitSlots).as("__cm_s"): _*)
      .groupBy((groupCols :+ "__cm_s").map(col): _*)
      .agg(sum("__cm_w").as("__cm_c"))
    assemble(sparse, groupCols, "__cm_s", "__cm_c", total, out)
  }

  /** The SPARSE stage of [[sketch]] exposed (groupCols..., slot, c —
    * non-hit counters absent): the storage/transport form the streaming
    * maintainer keeps its segments in, O(rows-with-hits) instead of
    * O(keys · depth·width) dense arrays; [[assembleSparse]] densifies.
    * Same counters, same monoid (slot-wise ADD on the sparse rows). */
  private[graft] def sketchSparse(df: DataFrame, groupCols: Seq[String],
                                  valueCol: String, depth: Int,
                                  width: Int): DataFrame = {
    slots(depth, width)
    val hitSlots = array((0 until depth).map(i =>
      lit(i.toLong * width) + bucket(col(valueCol), i, width)): _*)
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ explode(hitSlots).as("slot"): _*)
      .groupBy((groupCols :+ "slot").map(col): _*)
      .agg(count(lit(1)).as("c"))
  }

  /** Densifies a sparse (groupCols..., slot, c) frame back to the
    * [[sketch]] output shape — shared across the sketch families (their
    * dense layouts all coalesce absent slots to 0). */
  private[graft] def assembleSparse(sparse: DataFrame, groupCols: Seq[String],
                                    slotCol: String, cntCol: String,
                                    total: Int, out: String): DataFrame =
    assemble(sparse.select(groupCols.map(col) ++ Seq(
        col(slotCol).cast(LongType).as(slotCol), col(cntCol)): _*),
      groupCols, slotCol, cntCol, total, out)

  /** Dense-vector assembly from sparse (groupCols..., slotCol, cntCol)
    * rows: one bounded collect_list (≤ depth·width entries per group)
    * into a lookup map, read out in slot order. A GLOBAL sketch of an
    * empty input still yields one all-zero row (the family's contract):
    * a no-key groupBy always returns its single row, collect_list of
    * zero rows is the empty array, and every map lookup coalesces
    * to 0. */
  private def assemble(sparse: DataFrame, groupCols: Seq[String],
                       slotCol: String, cntCol: String, total: Int,
                       out: String): DataFrame = {
    // ONE native one-pass densify per group (graft.functions
    // .DenseFromSparse) — the map_from_entries + per-slot element_at
    // composition did a LINEAR map scan per dense slot, O(total · nnz)
    // per row; measured 1.8 s in one task on the q219 snapshot read.
    // Same semantics: absent slots 0, duplicate slots raise, slots
    // outside [0, total) ignored.
    val entries = collect_list(struct(
      col(slotCol).cast(LongType), col(cntCol).cast(LongType)))
    val dense = org.apache.spark.sql.execution.GraftColumnBridge.column(
      graft.functions.DenseFromSparse(
        org.apache.spark.sql.execution.GraftColumnBridge.expression(entries),
        total))
    sparse
      .groupBy(groupCols.map(col): _*)
      .agg(dense.as(out))
  }

  /** Element-wise sum of two counter arrays (same depth/width by
    * contract) — the ⊕ of the cube contract. NOT idempotent: merging a
    * sketch with itself doubles every count (multiset semantics). */
  def merge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)

  /** Re-aggregates a stored sketch column to coarser `groupCols` cells
    * (global when empty): the cube rollup, touching only the counter
    * vectors — never the raw rows. */
  def rollup(df: DataFrame, sketchCol: String, depth: Int, width: Int,
             groupCols: Seq[String]): DataFrame = {
    val total = slots(depth, width)
    require(df.columns.contains(sketchCol), s"no such column: $sketchCol")
    // the family's shape guard: a mismatched depth/width would silently
    // misalign every counter — wrong sketches, not an error
    val sk = when(size(col(sketchCol)) === total, col(sketchCol))
      .otherwise(raise_error(format_string(
        s"rollup: sketch array length %s != $total (depth $depth × width " +
          s"$width) — shape must match the stored sketch",
        size(col(sketchCol)).cast("string"))))
    val sparse = df
      .select(groupCols.map(col) :+ posexplode(sk): _*)
      .filter(col("col") =!= 0L) // zero cells add nothing; keep rows narrow
      .select(groupCols.map(col) ++ Seq(
        col("pos").cast(LongType).as("__cm_s"), col("col").as("__cm_c")): _*)
      .groupBy((groupCols :+ "__cm_s").map(col): _*)
      .agg(sum("__cm_c").as("__cm_c"))
    assemble(sparse, groupCols, "__cm_s", "__cm_c", total, sketchCol)
  }

  /** Total weight held by a sketch (BIGINT): each row adds its weight to
    * exactly one counter of depth row 0 (the first `width` slots), so
    * summing just that row recovers W exactly — integer arithmetic, no
    * division. */
  def total(sk: Column, width: Int): Column =
    aggregate(slice(sk, 1, width), lit(0L), (a, x) => a + x)

  /** The approximate count of `v` read from a sketch: min over the d
    * counters v hashes to. Never under the true count; over by ≤ ε·W
    * with probability 1−δ (ε = e/width, δ = e^−depth). An empty sketch
    * reads 0; a value never inserted usually reads 0 but may read a
    * small positive count (hash collisions) — the one-sided error. */
  def estimate(sk: Column, v: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    (0 until depth).map(i =>
      element_at(sk, (lit(i.toLong * width) + bucket(v, i, width) + 1L)
        .cast("int")))
      .reduce(least(_, _))
  }

  /** Inner-product (equi-JOIN SIZE) estimate from two sketches over the
    * same key domain (Cormode & Muthukrishnan §4.2): for each depth row
    * the counter dot-product Σ_j a[i·w+j]·b[i·w+j] over-counts
    * Σ_v fA(v)·fB(v) — the exact row count of A ⋈ B on that key — only
    * by hash collisions, so the MIN over depth rows is one-sided:
    * never under the true join size, over by ≤ ε·|A|·|B| with
    * probability 1−δ. The planner use: size a join from two stored
    * O(d·w) vectors without touching either table.
    *
    * Int64 bound (exact-integer read, so it can abort rather than
    * round): a depth row's dot product is ≤ W_A·W_B (all weight
    * concentrated in one cell), so two sketches whose TOTAL weights
    * multiply past Long.Max (W_A·W_B > ~9.2e18, e.g. two 2^32-weight
    * sketches) fail loudly under ANSI instead of estimating — downscale
    * weights, or use the planner-hint path ([[joinStrategy]] /
    * [[estimateJoinSizeD]]), which computes in DOUBLE and is safe at
    * any counter magnitude. */
  def estimateJoinSize(a: Column, b: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    (0 until depth).map { i =>
      aggregate(
        zip_with(slice(a, i * width + 1, width), slice(b, i * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }.reduce(least(_, _))
  }

  /** [[estimateJoinSize]] computed in DOUBLE — the planner-hint form:
    * an approximate read feeding a 3-way strategy decision does not need
    * the last integer digit, but it MUST NOT abort on big-corpus
    * sketches (counters near 2^32 overflow the exact form's per-cell
    * products). Same one-sided estimator, rounding error ~1 ulp per
    * add — irrelevant against the ε·|A|·|B| sketch error. */
  def estimateJoinSizeD(a: Column, b: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    (0 until depth).map { i =>
      aggregate(
        zip_with(slice(a, i * width + 1, width), slice(b, i * width + 1, width),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0d), (acc, v) => acc + v)
    }.reduce(least(_, _))
  }

  /** One-sided upper bound on the HOTTEST key's join contribution
    * max_v fA(v)·fB(v), read from the same two stored vectors: key v
    * lands in cell (i, h_i(v)) of every depth row, so fA(v)·fB(v) ≤
    * a[i,h_i(v)]·b[i,h_i(v)] ≤ max_j a[i,j]·b[i,j] for every i — the
    * MIN over depth rows of the per-row MAX cell product bounds every
    * key's contribution from above (never under the true hottest key;
    * over when unrelated keys share the max cell). This is the skew
    * signal [[joinStrategy]] reads: a join whose hottest key may own a
    * large share of the output wants salting, not a plain shuffle.
    * DOUBLE arithmetic (planner-hint path, overflow-safe). */
  def estimateHotJoinKeyD(a: Column, b: Column, depth: Int, width: Int): Column = {
    slots(depth, width)
    (0 until depth).map { i =>
      array_max(
        zip_with(slice(a, i * width + 1, width), slice(b, i * width + 1, width),
          (x, y) => x.cast("double") * y.cast("double")))
    }.reduce(least(_, _))
  }

  /** JOIN-STRATEGY hint from two stored COUNT sketches (weights = 1, so
    * [[total]] reads exact row counts) — the [[estimateJoinSize]]
    * consumer: pick how A ⋈ B should execute WITHOUT touching either
    * table, from two O(depth·width) vectors.
    *
    *   - 'broadcast' — the smaller side holds ≤ `broadcastRows` rows:
    *     ship it to every executor, no shuffle at all;
    *   - 'salted'    — the hottest key may own ≥ `skewShare1e6` ppm of
    *     an at-least-`skewMinRows`-row output
    *     ([[estimateHotJoinKeyD]] / [[estimateJoinSizeD]], both
    *     one-sided): a plain shuffle would hotspot one partition, salt
    *     the hot keys instead;
    *   - 'shuffle'   — everything else: the plain co-partitioned join.
    *
    * Both reads are never-under bounds, so the decision errs toward the
    * defensive strategy (a salt that wasn't needed costs a ×factor on
    * the hot slice; a hotspot that wasn't salted costs the job) — the
    * right direction for a hint. [[graft.operators.Salted.autoJoin]] is
    * the operator wiring; `graft_cms_join_strategy` the TVF. */
  def joinStrategy(a: Column, b: Column, depth: Int, width: Int,
                   broadcastRows: Long, skewShare1e6: Long = 200000L,
                   skewMinRows: Long = 1000000L): Column = {
    require(broadcastRows >= 0, s"broadcastRows must be >= 0, got $broadcastRows")
    require(skewShare1e6 >= 1 && skewShare1e6 <= 1000000,
      s"skewShare1e6 must be in [1, 1e6], got $skewShare1e6")
    val est = estimateJoinSizeD(a, b, depth, width)
    val hot = estimateHotJoinKeyD(a, b, depth, width)
    when(least(total(a, width), total(b, width)) <= broadcastRows, lit("broadcast"))
      .when(est >= skewMinRows.toDouble &&
        hot * lit(1000000d) >= est * skewShare1e6.toDouble, lit("salted"))
      .otherwise(lit("shuffle"))
  }

  /** Probe a stored sketch table with a value set: for each (sketch row
    * × probe value), the estimated count. `sketchDf` is (groupCols...,
    * sketchCol); `probes` is a single-column frame of values. The
    * deliberate shape is a BROADCAST product of two SMALL sides — one
    * O(groups) row of fixed-width state per sketch, one broadcast probe
    * list — O(groups·probes) work that never touches the raw rows (the
    * q22 exemption class: a product of smalls is not a corpus×corpus
    * nested loop). */
  def estimates(sketchDf: DataFrame, sketchCol: String,
                probes: DataFrame, depth: Int, width: Int): DataFrame = {
    val pc = probes.columns match {
      case Array(c) => c
      case cs => throw new IllegalArgumentException(
        s"probes must have exactly one column, got ${cs.mkString(",")}")
    }
    sketchDf.crossJoin(broadcast(probes))
      .withColumn("est",
        estimate(col(sketchCol), col(pc), depth, width))
      .drop(sketchCol)
  }

  /** The oracle-facing exact form: non-zero counters as (groupCols...,
    * slot, c) rows, ordered — what a cross-engine SQL replay pins
    * cell-for-cell (the estimate is approximate by nature and
    * spec-gated; the STATE is exact and oracle-gated). */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                depth: Int = 4, width: Int = 128,
                weightCol: Option[String] = None): DataFrame = {
    val sk = sketch(df, groupCols, valueCol, depth, width,
      weightCol = weightCol)
    sk.select(groupCols.map(col) :+ posexplode(col("sketch")): _*)
      .filter(col("col") > 0L)
      .select(groupCols.map(col) ++ Seq(col("pos").cast(LongType).as("slot"),
        col("col").as("c")): _*)
      .orderBy((groupCols :+ "slot").map(col): _*)
  }
}

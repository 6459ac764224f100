package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Whole-table relational utilities that aren't tied to one domain. */
object TableOps {

  /** Snapshot diff — the daily-pipeline "what changed between yesterday's
    * and today's extract" primitive: keys only in `newDf` → `added`, keys
    * only in `oldDf` → `removed`, keys in both whose non-key columns
    * differ → `changed`; unchanged rows are dropped. Output:
    * (<key>, status), ordered by key.
    *
    * The comparison is EXACT struct equality (null-safe `<=>`) over the
    * non-key columns in sorted-name order — no hashing, so no collision
    * caveat and a DuckDB oracle can replicate it cell-for-cell. At 100 TB
    * the shape is one full-outer sort-merge join co-partitioned on the
    * key; a production variant can pre-hash each side's struct down to
    * 8 bytes before the exchange (same join, 1/row-width the shuffle
    * volume) at the cost of a 2^-64 collision. */
  /** Mode (most frequent value) of `value` per `key`, deterministic
    * tie-break on the smaller value. Output: (<key>, mode_value, n).
    *
    * Window-free: count per (key, value), then a second map-side-combined
    * aggregation argmins the composite (-n, value) struct — struct
    * ordering is field-lexicographic, so the minimum is exactly "highest
    * count, then smallest value". Two exchanges on small count tables,
    * no per-key sort, no rank window — the shape that survives a key
    * whose value cardinality is huge. */
  def modePerGroup(df: DataFrame, key: String, value: String): DataFrame = {
    val counts = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("n"))
    counts.groupBy(col(key))
      .agg(min_by(struct(col(value).as("mode_value"), col("n")),
        struct((-col("n")).as("neg_n"), col(value).as("v"))).as("m"))
      .select(col(key), col("m.mode_value").as("mode_value"), col("m.n").as("n"))
      .orderBy(key)
  }

  /** Gini impurity of the `label` distribution within each `group`, as an
    * EXACT integer fraction: gini = 1 − Σ(cᵢ/n)² = (n² − Σcᵢ²) / n² —
    * the float-free form of the diversity/purity score behind decision-
    * tree splits, dataset-mixture balance checks ("is this source one
    * language or fifty?"), and per-user behavioral diversity. 0/n² = pure
    * (one label), approaching 1 = uniform over many labels. NULL labels
    * count as a label class of their own; NULL groups are a group.
    *
    * Frequency-compressed (the [[modePerGroup]] shape): count per
    * (group, label), then one map-side-combined aggregation of n and
    * Σc² — two exchanges on count tables, never a row-level shuffle.
    * Output: (<group>, n, gini_num, gini_den), ordered by group. Int64
    * exactness needs n ≤ ⌊√(2⁶³−1)⌋ per group — guarded per row, the
    * loud-failure discipline of the association miner. */
  def giniImpurity(df: DataFrame, group: String, label: String): DataFrame = {
    require(group != label, "group and label columns must differ")
    require(!Seq("n", "gini_num", "gini_den", "__c").contains(group),
      s"group column `$group` collides with an output/internal name")
    val counts = df.groupBy(col(group), col(label)).agg(count(lit(1)).as("__c"))
    counts.groupBy(col(group))
      .agg(sum("__c").as("n"), sum(col("__c") * col("__c")).as("__ss"))
      .select(col(group),
        when(col("n") <= 3037000499L, col("n"))
          .otherwise(raise_error(format_string(
            "giniImpurity: n² overflows Int64 at n=%s (> 3.03e9)", col("n"))))
          .as("n"),
        (col("n") * col("n") - col("__ss")).as("gini_num"),
        (col("n") * col("n")).as("gini_den"))
      .orderBy(group)
  }

  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    require(oldDf.columns.contains(key), s"key $key missing")
    val cols = oldDf.columns.filterNot(_ == key).sorted.toIndexedSeq
    def pack(df: DataFrame, side: String) =
      df.select(col(key), struct(cols.map(col): _*).as(side))
    pack(oldDf, "o").join(pack(newDf, "n"), Seq(key), "full_outer")
      .select(col(key),
        when(col("o").isNull, lit("added"))
          .when(col("n").isNull, lit("removed"))
          .when(!(col("o") <=> col("n")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(key)
  }

  /** Column-level diff blame — for every key CHANGED between two
    * snapshots, one row per column that actually differs, with both
    * values rendered as strings: the [[snapshotDiff]] drill-down a CDC
    * debugging session reaches for ("which column moved, from what, to
    * what"). NULL-safe: a NULL→value or value→NULL transition is a
    * difference and the NULL side stays NULL in the output. Keys only in
    * one snapshot are out of scope here (they have no column-wise blame;
    * [[snapshotDiff]] reports them as added/removed). Output:
    * (<key>, col_name, old_val, new_val), ordered by (key, col_name).
    *
    * Scale shape: one co-partitioned inner join on the key; rows are
    * filtered to changed ones by ONE struct comparison BEFORE the
    * per-column explode, so the ×#cols fan-out touches only changed rows
    * — a 10⁹-row table with 10³ changed rows explodes 10³·#cols, not
    * 10⁹·#cols. */
  def snapshotDiffColumns(oldDf: DataFrame, newDf: DataFrame,
                          key: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs " +
        newDf.columns.mkString(","))
    require(oldDf.columns.contains(key), s"key $key missing")
    val cols = oldDf.columns.filterNot(_ == key).sorted.toIndexedSeq
    def pack(df: DataFrame, side: String) =
      df.select(col(key), struct(
        cols.map(c => col(c).cast(StringType).as(c)): _*).as(side))
    pack(oldDf, "o").join(pack(newDf, "n"), Seq(key))
      .filter(!(col("o") <=> col("n")))
      .select(col(key), explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(s"o.$c").as("old_val"),
          col(s"n.$c").as("new_val"))): _*)).as("d"))
      .filter(!(col("d.old_val") <=> col("d.new_val")))
      .select(col(key), col("d.col_name"), col("d.old_val"),
        col("d.new_val"))
      .orderBy(key, "col_name")
  }

  /** Join-key profile — the pre-join diagnostic that predicts whether an
    * equi-join is safe to run: per side, row/NULL-key/distinct-key
    * counts, how many rows actually find a match, and the maximum key
    * multiplicity; plus the shared-key count and the EXACT inner-join
    * output cardinality Σ cnt_a·cnt_b (the number a query planner
    * estimates and a skewed key silently explodes — max_mult_a ·
    * max_mult_b bounds the single-key worst case, the salting decision
    * input). NULL keys are counted but excluded from matching (SQL
    * equi-join semantics). Output: one row (n_rows_a, n_null_a,
    * n_keys_a, rows_a_matched, max_mult_a, …same for b…, n_keys_both,
    * join_rows). join_rows is decimal-checked and raises past Int64 —
    * the profile refusing to print a number the join itself could not
    * materialize.
    *
    * Scale shape: each side collapses to its O(distinct keys) count
    * table map-side; ONE full-outer co-partitioned join of the two key
    * tables, then a single aggregation — the data rows never join. */
  def joinProfile(a: DataFrame, keyA: String, b: DataFrame,
                  keyB: String): DataFrame = {
    def keys(df: DataFrame, key: String, cnt: String) =
      df.filter(col(key).isNotNull)
        .groupBy(col(key).as("__k")).agg(count(lit(1)).as(cnt))
    def nulls(df: DataFrame, key: String) =
      df.filter(col(key).isNull).count()
    // O(1) driver scalars (the bounded-state class)
    val (nullA, nullB) = (nulls(a, keyA), nulls(b, keyB))
    def dec(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    keys(a, keyA, "ca").join(keys(b, keyB, "cb"), Seq("__k"), "full_outer")
      .agg(
        coalesce(sum("ca"), lit(0L)).as("n_rows_a"),
        count(col("ca")).as("n_keys_a"),
        coalesce(sum(when(col("cb").isNotNull, col("ca"))), lit(0L))
          .as("rows_a_matched"),
        coalesce(max("ca"), lit(0L)).as("max_mult_a"),
        coalesce(sum("cb"), lit(0L)).as("n_rows_b"),
        count(col("cb")).as("n_keys_b"),
        coalesce(sum(when(col("ca").isNotNull, col("cb"))), lit(0L))
          .as("rows_b_matched"),
        coalesce(max("cb"), lit(0L)).as("max_mult_b"),
        count(when(col("ca").isNotNull && col("cb").isNotNull, lit(1)))
          .as("n_keys_both"),
        coalesce(sum(dec(col("ca")) * dec(col("cb"))), lit(0L)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("__jr"))
      .withColumn("join_rows", when(col("__jr") > lit(Long.MaxValue),
        raise_error(lit("joinProfile: inner-join cardinality overflows " +
          "Int64 — the join itself would not materialize")))
        .otherwise(col("__jr").cast(LongType)))
      .select(col("n_rows_a"), lit(nullA).as("n_null_a"), col("n_keys_a"),
        col("rows_a_matched"), col("max_mult_a"),
        col("n_rows_b"), lit(nullB).as("n_null_b"), col("n_keys_b"),
        col("rows_b_matched"), col("max_mult_b"),
        col("n_keys_both"), col("join_rows"))
  }

  /** 2-D fixed-grid histogram — the joint distribution heatmap behind
    * "value by hour", "latency by region bucket" views: both BIGINT
    * columns floored onto `binX`/`binY`-wide cells (pmod form, so
    * negatives land correctly), with per-cell count and the x/y sums
    * (enough to place the cell centroid). One map-side-combined
    * aggregation — the exchange carries O(#cells) rows per task, never
    * the data. Rows with a NULL coordinate are excluded (they have no
    * cell). Output: (bin_x, bin_y, lo_x, lo_y, n, sum_x, sum_y),
    * cell-ordered. */
  def histogram2d(df: DataFrame, xCol: String, yCol: String,
                  binX: Long, binY: Long): DataFrame = {
    require(binX >= 1 && binY >= 1,
      s"bin widths must be >= 1, got ($binX, $binY)")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(
        expr(s"((`$xCol` - pmod(`$xCol`, $binX)) div $binX)").as("bin_x"),
        expr(s"((`$yCol` - pmod(`$yCol`, $binY)) div $binY)").as("bin_y"),
        col(xCol).as("__x"), col(yCol).as("__y"))
      .groupBy("bin_x", "bin_y")
      .agg(count(lit(1)).as("n"), sum("__x").as("sum_x"),
        sum("__y").as("sum_y"))
      .select(col("bin_x"), col("bin_y"),
        (col("bin_x") * binX).as("lo_x"), (col("bin_y") * binY).as("lo_y"),
        col("n"), col("sum_x"), col("sum_y"))
      .orderBy("bin_x", "bin_y")
  }

  /** ABC / Pareto contribution analysis — groups ranked by their value
    * sum, with the running total and the classic A/B/C classes: a group
    * is 'A' if it STARTS before the `aPct`% cumulative boundary
    * (cum_before·100 < aPct·total — exclusive-prefix rule, so the top
    * group is always A even when it alone exceeds the boundary), 'B'
    * before `bPct`%, else 'C'. The "20% of SKUs carry 80% of revenue"
    * report, exact: integer comparisons only, no float shares. Output:
    * (<group>, sum_x, rank, cum_before, abc_class), rank-ordered
    * (ties broken by group).
    *
    * Scale shape: one map-side-combined per-group sum to O(#groups)
    * rows; the rank is a distributed [[GlobalRank]] and the running
    * total a [[PrefixSum]] range scan over that small table — never a
    * partitionless window. Negative sums raise (Pareto shares are
    * ill-defined under mixed sign); total·100 is overflow-guarded. */
  def abcAnalysis(df: DataFrame, group: String, x: String,
                  aPct: Int = 80, bPct: Int = 95): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct < 100,
      s"need 0 < aPct < bPct < 100, got ($aPct, $bPct)")
    val reserved = Set("sum_x", "rank", "cum_before", "abc_class")
    Seq(group, x).foreach(c => require(!reserved.contains(c),
      s"abcAnalysis: column name '$c' collides with an output name"))
    val sums = df.filter(col(x).isNotNull)
      .groupBy(col(group)).agg(sum(col(x)).as("sum_x"))
    require(sums.filter(col("sum_x") < 0).limit(1).count() == 0L,
      s"abcAnalysis: negative group sums in '$x' — shares are ill-defined")
    // O(1) driver scalar (the bounded-state class)
    val tRow = sums.agg(sum("sum_x")).head
    val total = if (tRow.isNullAt(0)) 0L else tRow.getLong(0)
    require(total <= Long.MaxValue / 100,
      s"abcAnalysis: total * 100 overflows Int64 (total=$total)")
    val ranked = GlobalRank.withRank(sums, numParts = 0, "__r",
      col("sum_x").desc, col(group))
    PrefixSum.exclusive(ranked, "sum_x", "cum_before", numParts = -1,
        col("sum_x").desc, col(group))
      .select(col(group), col("sum_x"), (col("__r") + 1L).as("rank"),
        col("cum_before"),
        when(col("cum_before") * 100 < lit(aPct.toLong) * total, lit("A"))
          .when(col("cum_before") * 100 < lit(bPct.toLong) * total, lit("B"))
          .otherwise(lit("C")).as("abc_class"))
      .orderBy("rank")
  }

  /** Top-k contributors per group with an OTHERS rollup — the report
    * shape every "top products per region" chart needs: within each
    * group, the k largest items by value sum keep their identity
    * (rank-ordered, ties broken by item) and the remainder collapses to
    * ONE `<OTHERS>` row carrying the residual sum and its item count, so
    * totals reconcile without a second query. Output: (<group>, item
    * STRING, sum_x, n_items, rank) with rank k+1 for the OTHERS row;
    * groups with ≤ k items have no OTHERS row.
    *
    * Scale shape: one map-side-combined (group, item) sum to
    * O(distinct pairs) rows; the rank window and the rollup re-agg both
    * run over that compressed table, partitioned by group — raw rows
    * never meet a window. */
  def topKWithOthers(df: DataFrame, group: String, item: String,
                     x: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(Seq(group, item, x).distinct.size == 3,
      s"group/item/value columns must be distinct, got ($group, $item, $x)")
    val sums = df.filter(col(x).isNotNull)
      .groupBy(col(group), col(item).cast(StringType).as("item"))
      .agg(sum(col(x)).as("sum_x"))
    require(sums.filter(col("item") === "<OTHERS>").limit(1).count() == 0L,
      "topKWithOthers: an item renders as the reserved label '<OTHERS>'")
    val w = Window.partitionBy(group)
      .orderBy(col("sum_x").desc, col("item"))
    sums
      .withColumn("rank", row_number().over(w).cast(LongType))
      .withColumn("item",
        when(col("rank") <= k, col("item")).otherwise(lit("<OTHERS>")))
      .withColumn("rank", least(col("rank"), lit(k.toLong + 1)))
      .groupBy(col(group), col("item"), col("rank"))
      .agg(sum("sum_x").as("sum_x"), count(lit(1)).as("n_items"))
      .select(col(group), col("item"), col("sum_x"), col("n_items"),
        col("rank"))
      .orderBy(group, "rank")
  }

  /** Equi-depth scoring of one or more BIGINT metric columns — each row
    * gets, per metric, its global quantile bucket 0..nBuckets−1 under the
    * [[equiDepthBuckets]] value-deterministic rule (bucket =
    * rows-strictly-below · B div n, ties always share a bucket). With
    * recency/frequency/monetary metrics and nBuckets = 5 this IS the
    * classic RFM segmentation, exact and engine-replayable where
    * NTILE-based scorers split ties arbitrarily. NULL metric values
    * score NULL. Output: the input columns plus `<col>_score` per
    * metric.
    *
    * Scale shape: per metric, one map-side-combined distinct-value count
    * + a [[PrefixSum]] range scan over the O(distinct values) table
    * (never a partitionless window), then ONE join back keyed on the
    * metric value — an O(distinct values) table the data joins against
    * (broadcast while it fits). k metrics = k such passes, each
    * column-pruned. */
  def equiDepthScores(df: DataFrame, cols: Seq[String],
                      nBuckets: Int): DataFrame = {
    require(cols.nonEmpty, "equiDepthScores needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
      require(!df.columns.contains(s"${c}_score"),
        s"input already has a '${c}_score' column")
    }
    // the input feeds 2 plan branches + 1 driver action PER metric plus
    // the accumulating joins — checkpoint once so an expensive upstream
    // (e.g. the RFM per-customer aggregation) runs once, not 3k+1 times
    // (the Triangles cross-branch-CSE lesson; released by the caller's
    // Checkpoints.releaseAll cycle)
    val src = Checkpoints.checkpoint(df)
    // NOTE (r15 optimization round): a thread-pooled variant overlapping
    // the k independent metric passes (guide §2.6) DEADLOCKED when the
    // operator is invoked from a SQL TVF — the TVF builder runs inside
    // `SessionCatalog.lookupFunction` HOLDING the catalog monitor, and
    // the pool threads' driver actions block on that same monitor during
    // analysis while the builder awaits the pool. Sequential passes are
    // the correct shape for an operator that must be callable from
    // analysis context; the per-pass win came from sizing the prefix
    // scan (PrefixSum numParts <= 0 path), which is kept.
    val scored = cols.foldLeft(src) { (acc, c) =>
      val cnts = src.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      val nRow = cnts.agg(sum("__cnt")).head
      val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
      if (n == 0L) acc.withColumn(s"${c}_score", lit(null).cast(LongType))
      else {
        require(n <= Long.MaxValue / nBuckets,
          s"equiDepthScores: n * nBuckets overflows Int64 (n=$n)")
        val buckets = PrefixSum
          .exclusive(cnts, "__cnt", "__below", numParts = -1, col(c))
          .select(col(c),
            expr(s"(__below * $nBuckets) div ${n}L").as(s"${c}_score"))
        acc.join(buckets, Seq(c), "left")
      }
    }
    // equi-joins move their key first — restore input order, scores after
    scored.select((df.columns.map(col) ++
      cols.map(c => col(s"${c}_score"))).toIndexedSeq: _*)
  }

  /** Fixed-width histogram of the BIGINT column `valueCol`: bin id is the
    * floor of value/binWidth (pmod form, so negative values land in the
    * correct bin), with per-bin count, min, max and sum. One map-side-
    * combined aggregation — the exchange carries O(#bins) rows per task,
    * never the data. (For an equi-DEPTH histogram use the exact splitters
    * of [[OrderStats]] instead: this is the fixed-grid, SQL-replayable
    * form.) Output: (bin, lo = bin·binWidth, n, min_v, max_v, sum_v). */
  def histogram(df: DataFrame, valueCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    df.select(expr(
        s"((`$valueCol` - pmod(`$valueCol`, $binWidth)) div $binWidth)").as("bin"),
        col(valueCol).as("v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"),
        max("v").as("max_v"), sum("v").as("sum_v"))
      .withColumn("lo", col("bin") * binWidth)
      .select("bin", "lo", "n", "min_v", "max_v", "sum_v")
      .orderBy("bin")
  }

  /** Latest-wins changelog merge — the CDC / SQL-MERGE primitive: apply a
    * stream of keyed upserts and deletes to a base snapshot. `changes`
    * carries the base's columns plus `opCol` ('U' upsert / 'D' delete)
    * and a BIGINT `seqCol`; per key the change with the highest
    * (seq, op, row) wins — the struct tiebreak keeps the merge
    * deterministic even under duplicate sequence numbers — and an
    * upsert REPLACES the whole row (no per-column coalesce), a delete
    * removes the key, keys never touched pass through.
    *
    * Scale shape: the changelog first collapses to one row per key via a
    * map-side-combined max_by (so a hot key's million updates never meet
    * the join), then ONE co-partitioned full-outer join against the base
    * — exactly the shuffle pattern a 100 TB daily-merge wants. */
  /** Functional-dependency check — data profiling's key-discovery
    * primitive: for each candidate (determinant → dependent) pair, does
    * every determinant value map to exactly one dependent value? Output
    * per pair: (det, dep, n_det, n_pairs, max_deps, holds) where n_det
    * counts distinct determinant values, n_pairs distinct (det, dep)
    * combinations, max_deps the worst per-determinant fan-out, and
    * holds = 1 iff max_deps = 1 (equivalently n_det = n_pairs) — the
    * violation DEGREE, not just a boolean. Rows where either column is
    * NULL are excluded (the engine-portable convention: NULL determines
    * nothing and is determined by nothing). Ordered by (det, dep).
    *
    * Scale shape: one column-pruned two-level aggregation per pair (the
    * [[profileBatched]] discipline — no row multiplication, no Expand);
    * the exchange per pair is O(distinct combinations). */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDeps needs at least one column pair")
    pairs.foreach { case (a, b) =>
      require(df.columns.contains(a) && df.columns.contains(b),
        s"unknown column in pair ($a, $b)")
      require(a != b, s"determinant and dependent must differ, got ($a, $b)")
    }
    pairs.map { case (a, b) =>
      df.select(col(a).as("__x"), col(b).as("__y"))
        .filter(col("__x").isNotNull && col("__y").isNotNull)
        .groupBy("__x", "__y").agg(count(lit(1)).as("__n"))
        .groupBy("__x").agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("n_det"), sum("__c").as("n_pairs"),
          max("__c").as("max_deps"))
        .select(lit(a).as("det"), lit(b).as("dep"),
          coalesce(col("n_det"), lit(0L)).as("n_det"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("max_deps"), lit(0L)).as("max_deps"),
          // an empty relation vacuously satisfies every FD
          when(col("max_deps").isNull || col("max_deps") === 1L, lit(1L))
            .otherwise(lit(0L)).as("holds"))
    }.reduce(_ unionByName _).orderBy("det", "dep")
  }

  /** The INVERSE of [[applyChangelog]]: diff two snapshots into the
    * minimal changelog that transforms `base` into `target` — upserts
    * ("U", target values) for added and changed keys, deletes ("D",
    * NULL values) for removed keys, nothing for unchanged keys. The
    * round-trip law `applyChangelog(base, makeChangelog(base, target)) ≡
    * target` is spec-pinned; together the pair is the snapshot-diff
    * replication unit (compute the delta once, ship and apply it
    * anywhere) — [[snapshotDiff]]'s status report upgraded to an
    * APPLYABLE artifact. Comparison is null-safe per whole row (the
    * snapshotDiff struct convention). One co-partitioned full-outer
    * join; output (key, op, seq, value columns in base order), ordered
    * by key. */
  def makeChangelog(base: DataFrame, target: DataFrame, key: String,
                    seq: Long = 0L, opCol: String = "op",
                    seqCol: String = "seq"): DataFrame = {
    require(base.columns.sorted.sameElements(target.columns.sorted),
      s"snapshot schemas differ: ${base.columns.mkString(",")} vs ${target.columns.mkString(",")}")
    require(base.columns.contains(key), s"key $key missing")
    val valCols = base.columns.filterNot(_ == key).toIndexedSeq
    require(valCols.nonEmpty, "base needs at least one non-key column")
    require(!valCols.contains(opCol) && !valCols.contains(seqCol) &&
      key != opCol && key != seqCol,
      s"op/seq column names ($opCol/$seqCol) collide with snapshot columns")
    def pack(df: DataFrame, side: String) =
      df.select(col(key), struct(valCols.map(col): _*).as(side))
    pack(base, "o").join(pack(target, "n"), Seq(key), "full_outer")
      .filter(!(col("o") <=> col("n")))
      .select(Seq(col(key),
        when(col("n").isNull, lit("D")).otherwise(lit("U")).as(opCol),
        lit(seq).as(seqCol)) ++
        valCols.map(c => col(s"n.$c").as(c)): _*)
      .orderBy(key)
  }

  def applyChangelog(base: DataFrame, changes: DataFrame, key: String,
                     opCol: String = "op", seqCol: String = "seq"): DataFrame =
    mergeChangelogOnce(base, changes, key, opCol, seqCol).orderBy(key)

  /** One changelog merge WITHOUT the final global order — the loop body
    * of [[applyChangelogs]] (ordering every intermediate batch would add
    * a full sort per batch for nothing); also the per-micro-batch fold
    * of the streaming [[graft.streaming.EventStreaming.UpsertMaintainer]]. */
  private[graft] def mergeChangelogOnce(base: DataFrame, changes: DataFrame, key: String,
                                        opCol: String, seqCol: String): DataFrame = {
    // base ORDER for the output (a caller writing the merge back over the
    // base positionally must get the base's own column order); SORTED
    // order only where determinism needs it — the schema-set check and
    // the tiebreak struct
    val valColsBase = base.columns.filterNot(_ == key).toIndexedSeq
    val valCols = valColsBase.sorted
    require(valCols.nonEmpty, "base needs at least one non-key column")
    val expected = (valCols ++ Seq(key, opCol, seqCol)).sorted
    require(changes.columns.sorted.sameElements(expected),
      s"changes columns ${changes.columns.sorted.mkString(",")} != expected ${expected.mkString(",")}")
    val latest = changes.groupBy(col(key))
      .agg(max_by(
        struct(col(opCol).as("op"), struct(valCols.map(col): _*).as("v")),
        struct(col(seqCol), col(opCol), struct(valCols.map(col): _*))).as("c"))
    base.select(col(key), struct(valCols.map(col): _*).as("b"))
      .join(latest, Seq(key), "full_outer")
      .filter(col("c").isNull || col("c.op") =!= "D")
      .withColumn("r", when(col("c").isNotNull, col("c.v")).otherwise(col("b")))
      .select(col(key) +: valColsBase.map(c => col(s"r.$c").as(c)): _*)
  }

  /** CDC COMPACTION LOOP — the daily-pipeline shape: a base snapshot and
    * N changelog batches applied IN ORDER (each batch's sequence numbers
    * are local to that batch; a later batch always beats an earlier one,
    * so a key deleted in batch 1 and upserted in batch 2 is revived).
    * Equivalent to folding [[applyChangelog]] but with the iterative-
    * operator discipline: each merged snapshot is lineage-truncated
    * through [[Checkpoints.checkpoint]] (plan size and the stats
    * estimate stay bounded at any batch count — the PageRank/KCore loop
    * pattern, spec-pinned in `TableOpsSpec`), the consumed round's
    * blocks are released the moment the next round materializes, and the
    * single global sort happens ONCE at the end, not per batch. Per
    * batch the cost is exactly one map-side changelog collapse plus one
    * co-partitioned full-outer join. */
  def applyChangelogs(base: DataFrame, batches: Seq[DataFrame], key: String,
                      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    require(batches.nonEmpty, "applyChangelogs needs at least one batch")
    var cur = base
    var prevCp: Option[DataFrame] = None
    for (b <- batches) {
      val merged = Checkpoints.checkpoint(
        mergeChangelogOnce(cur, b, key, opCol, seqCol))
      // the new snapshot is materialized (eager checkpoint); the previous
      // round's blocks are dead weight — release, don't pin every batch
      prevCp.foreach(Checkpoints.release)
      prevCp = Some(merged)
      cur = merged
    }
    cur.orderBy(key)
  }

  /** Median absolute deviation per group over a BIGINT column — the
    * robust spread statistic quality pipelines prefer over stddev (one
    * corrupt outlier moves stddev arbitrarily, MAD not at all). Both
    * medians are the LOWER order statistic (element at rank ⌈n/2⌉), so
    * every value is exact and engine-replayable — no interpolation, no
    * floats. Output: (<group>, n, med, mad).
    *
    * Each median is found by FREQUENCY COMPRESSION, not a per-group row
    * sort: a map-side-combined (group, value) count first, then the rank
    * scan (cumulative-count window) runs over the tiny distinct-value
    * table. With a handful of groups a naive per-group window would sort
    * ALL rows in #groups tasks — measured 26× slower at 100× rows on a
    * 5-group corpus; compressing first keeps the heavy aggregation fully
    * parallel and the window O(distinct values). Worst case (all values
    * distinct) degrades gracefully to the plain sorted-rank cost. */
  def madPerGroup(df: DataFrame, group: String, x: String): DataFrame = {
    // the rank-scan machinery introduces these names; a caller column
    // that collides (group = "med", x = "dev", …) would turn into a
    // duplicate-column / ambiguous-reference analysis error deep inside
    // the plan — reject it at the API boundary instead
    val reserved = Set("med", "dev", "mad", "n", "med_n", "dev_n")
    Seq(group, x).foreach(c => require(
      !reserved.contains(c) && !c.startsWith("__"),
      s"madPerGroup: column name '$c' collides with an internal name " +
        s"(reserved: ${reserved.mkString(", ")}, __*) — alias it first"))
    def lowerMedian(in: DataFrame, v: String, out: String): DataFrame = {
      val cnts = in.groupBy(col(group), col(v)).agg(count(lit(1)).as("__cnt"))
      val w = Window.partitionBy(group).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnts
        .withColumn("__cum", sum("__cnt").over(w))
        .withColumn("__n", sum("__cnt").over(Window.partitionBy(group)))
        // the value whose cumulative count first reaches rank ceil(n/2)
        .filter(col("__cum") - col("__cnt") < expr("(__n + 1) div 2") &&
          expr("(__n + 1) div 2") <= col("__cum"))
        .select(col(group), col(v).as(out), col("__n").as(s"${out}_n"))
    }
    val med = lowerMedian(df.select(col(group), col(x)), x, "med")
    val dev = df.select(col(group), col(x))
      .join(med, Seq(group))
      .select(col(group), abs(col(x) - col("med")).as("dev"))
    lowerMedian(dev, "dev", "mad")
      .join(med, Seq(group))
      .select(col(group), col("med_n").as("n"), col("med"), col("mad"))
      .orderBy(group)
  }

  /** Zero-floor running balance — inventory/credit semantics where the
    * balance can never go negative: y_t = max(0, y_{t−1} + Δ_t). The
    * clamp makes the fold non-associative, but it has a closed form over
    * plain windows: with S_t the running sum of deltas and
    * M_t = min_{i≤t} S_i,  y_t = S_t − min(M_t, 0) — every unit of
    * "would-be-negative" mass is exactly the depth of the deepest prefix
    * dip, so two partitioned cumulative windows (sum + min) replace a
    * sequential scan. Exact Int64; any engine replays it. (Only the
    * ZERO floor telescopes like this — a general floor/cap pair is the
    * sequential [[graft.events.EventOps.ewma]]-style fold.)
    *
    * `(key, ord)` must uniquely identify rows — the window frame is
    * row-ordered, so duplicate ord values would make the fold
    * order-ambiguous. Output: (key, ord, delta, balance), ordered. */
  def zeroFloorBalance(df: DataFrame, key: String, ord: String,
                       delta: String): DataFrame = {
    require(Seq(key, ord, delta).distinct.size == 3,
      "key/ord/delta columns must be distinct")
    val w = Window.partitionBy(key).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(key), col(ord), col(delta).cast(LongType).as(delta))
      .withColumn("__s", sum(delta).over(w))
      .withColumn("__m", min("__s").over(w))
      .select(col(key), col(ord), col(delta),
        (col("__s") - least(col("__m"), lit(0L))).as("balance"))
      .orderBy(key, ord)
  }

  /** Robust outlier rows by the MAD rule: every (group, x) whose
    * deviation from the group's exact lower median exceeds
    * `mult`·MAD — the outlier filter that survives what the z-score
    * does not (one wild value corrupts mean AND stddev; the median/MAD
    * pair shrugs it off). All-integer: `mult` is a whole-number
    * multiplier (fold the 1.4826 normal-consistency constant into your
    * choice of mult — 3·MAD ≈ 2·σ-equivalent), so any engine replays
    * the flags exactly. Groups with MAD = 0 (over half the mass on one
    * value) flag EVERY deviating row — the honest reading of "the
    * group does not vary". Output: (group, x, med, mad, dev) per
    * flagged row (duplicates kept — each event flags), ordered by
    * (group, x). Cost: [[madPerGroup]] + one O(#groups) stats join. */
  def robustOutliers(df: DataFrame, group: String, x: String,
                     mult: Long): DataFrame = {
    require(mult >= 1, s"mult must be >= 1, got $mult")
    val stats = madPerGroup(df, group, x)
    df.select(col(group), col(x))
      .join(stats.select(col(group), col("med"), col("mad")), Seq(group))
      .filter(abs(col(x) - col("med")) > lit(mult) * col("mad"))
      .select(col(group), col(x), col("med"), col("mad"),
        abs(col(x) - col("med")).as("dev"))
      .orderBy(group, x)
  }

  /** Missing id ranges — "which sequence numbers never arrived": the
    * gaps between consecutive DISTINCT values of `idCol`, as
    * (gap_start, gap_end, gap_len) closed intervals. The neighbor pair
    * is NOT a partitionless window (the single-task sort the plan audit
    * bans): it reuses the TeraSort sliding machinery —
    * [[SlidingAggregate.scalable]] with window 2 and the Min monoid
    * puts each distinct id beside its predecessor under range
    * partitioning with bounded boundary replication, so the exchange is
    * O(distinct ids) across however many tasks the data needs. Ordered
    * by gap_start. */
  def missingRanges(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast(org.apache.spark.sql.types.LongType).as("__id"))
      .filter(col("__id").isNotNull).distinct()
    SlidingAggregate.scalable(ids, "__id", "__id", window = 2,
        numParts = 0, LongMonoid.Min)
      .filter(col("key") - col("agg") > 1L)
      .select((col("agg") + 1L).as("gap_start"), (col("key") - 1L).as("gap_end"),
        (col("key") - col("agg") - 1L).as("gap_len"))
      .orderBy("gap_start")
  }

  /** Exact OLS sufficient statistics per group for y ~ a + b·x over
    * BIGINT columns: (n, Σx, Σy, Σx², Σxy) plus the closed-form slope
    * fraction b = slope_num / slope_den with slope_num = n·Σxy − Σx·Σy
    * and slope_den = n·Σx² − (Σx)² — the regression/correlation
    * pre-aggregation that stays EXACT across engines (integer arithmetic;
    * float slopes drift with summation order). One map-side-combined
    * aggregation; downstream does the one division (or combines groups —
    * the statistics are algebraic and mergeable by plain addition, which
    * is what makes this the right shuffle unit for distributed model
    * fitting). Caller keeps x, y small enough that n·Σx² and n·Σxy fit
    * Int64 — re-center x to its observed origin first (as the gate does)
    * rather than feeding raw epoch values. */
  def linregStats(df: DataFrame, group: String, x: String, y: String): DataFrame =
    df.groupBy(col(group))
      .agg(count(lit(1)).as("n"),
        sum(col(x)).as("sum_x"), sum(col(y)).as("sum_y"),
        sum(col(x) * col(x)).as("sum_xx"),
        sum(col(x) * col(y)).as("sum_xy"))
      .select(col(group), col("n"), col("sum_x"), col("sum_y"),
        col("sum_xx"), col("sum_xy"),
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")).as("slope_num"),
        (col("n") * col("sum_xx") - col("sum_x") * col("sum_x")).as("slope_den"))
      .orderBy(group)

  /** Exact percent-rank table per group — rank-based feature scaling
    * (percentile normalization), the preprocessing step that is robust
    * where min-max and z-score are outlier-hostage. For every DISTINCT
    * (group, x): its multiplicity `cnt`, `rank_m1` = #rows in the group
    * strictly below x (RANK−1 under competition ranking), and `n_m1` =
    * group size − 1; the caller's percent rank is rank_m1/n_m1 (kept as
    * an exact integer fraction — no floats, engine-replayable; join
    * this table back to the data to scale it).
    *
    * FREQUENCY-COMPRESSED like [[madPerGroup]]: one map-side-combined
    * (group, x) count, then the cumulative window runs over the tiny
    * distinct-value table — never a per-group sort of raw rows, the
    * shape that survives a group with a billion rows and a thousand
    * distinct values. */
  def percentRanks(df: DataFrame, group: String, x: String): DataFrame = {
    val reserved = Set("cnt", "rank_m1", "n_m1")
    Seq(group, x).foreach(c => require(
      !reserved.contains(c) && !c.startsWith("__"),
      s"percentRanks: column name '$c' collides with an output name " +
        s"(${reserved.mkString(", ")}, __*) — alias it first"))
    val cnts = df.groupBy(col(group), col(x)).agg(count(lit(1)).as("cnt"))
    val below = Window.partitionBy(group).orderBy(x)
      .rowsBetween(Window.unboundedPreceding, -1)
    cnts
      .withColumn("rank_m1", coalesce(sum("cnt").over(below), lit(0L)))
      .withColumn("n_m1",
        sum("cnt").over(Window.partitionBy(group)) - 1L)
      .orderBy(group, x)
  }

  /** Largest-remainder proration — split each group's integer total
    * across its rows proportionally to a weight so the shares SUM BACK
    * EXACTLY to the total (the financial-allocation invariant naive
    * rounding breaks): base_i = ⌊total·w_i / W⌋, and the leftover
    * total − Σ base (< #rows units, one per lost floor fraction) goes
    * +1 each to the rows with the largest remainders (total·w_i mod W),
    * ties broken by ascending id — the Hamilton apportionment rule,
    * deterministic and engine-replayable. Output: (group, id, weight,
    * share), ordered by (group, id); Σ share per group ≡ total.
    *
    * Rows whose group has no total drop (inner join); totals with no
    * rows stay unallocated. NULL/negative weights and negative or
    * oversized totals raise (weights and totals are bounded at 2³¹−1 so
    * total·weight stays exact in Int64). Groups summing to W = 0 raise —
    * there is no proportion to honor. Both windows are partitioned by
    * the group key; the shuffle unit is the fact table itself. */
  def prorate(rows: DataFrame, group: String, id: String, weightCol: String,
              totals: DataFrame, totalCol: String): DataFrame = {
    val reserved = Set("__w", "__t", "__big", "__base", "__rem", "__rk")
    Seq(group, id, weightCol).foreach(c => require(
      !reserved.contains(c) && c != "share",
      s"prorate: column name '$c' collides with an internal/output name"))
    def bounded(c: String, what: String) =
      when(col(c).isNotNull && col(c) >= 0 && col(c) <= 2147483647L, col(c))
        .otherwise(raise_error(format_string(
          s"prorate: $what %s must be in [0, 2^31-1] and non-NULL", col(c))))
    val r = rows.select(col(group), col(id),
      bounded(weightCol, s"weight $weightCol").cast(LongType).as("__w"))
    val t = totals.select(col(group),
      bounded(totalCol, s"total $totalCol").cast(LongType).as("__t"))
    val byGroup = Window.partitionBy(group)
    val j = r.join(t, Seq(group))
      .withColumn("__big", sum("__w").over(byGroup))
      .withColumn("__big", when(col("__big") > 0, col("__big"))
        .otherwise(raise_error(format_string(
          "prorate: group %s has zero total weight", col(group)))))
      .withColumn("__base", expr("(__t * __w) div __big"))
      .withColumn("__rem", expr("(__t * __w) % __big"))
    j.withColumn("__rk", row_number().over(
        Window.partitionBy(group).orderBy(col("__rem").desc, col(id))))
      .withColumn("share",
        col("__base") + when(col("__rk") <= col("__t")
          - sum("__base").over(byGroup), 1L).otherwise(0L))
      .select(col(group), col(id), col("__w").as(weightCol), col("share"))
      .orderBy(group, id)
  }

  /** Winsorization — clamp a BIGINT column to its group's exact
    * [loNum/den, hiNum/den] quantile values, the outlier treatment ML
    * feature pipelines apply where dropping rows (the filter form) would
    * bias the sample. Thresholds use the library's deterministic rank
    * convention (the value at 0-indexed rank ⌊num·n/den⌋ of the group's
    * non-NULL values ascending — `Pipeline.filterByQuantilePerGroup`'s
    * exact, engine-replayable cut; approx_percentile would make the
    * clamp partition-dependent).
    *
    * FREQUENCY-COMPRESSED like [[madPerGroup]]: one map-side-combined
    * (group, x) count, ONE cumulative window over the distinct-value
    * table, and both thresholds read off it in a single conditional
    * aggregation — the O(#groups) threshold frame then joins back
    * (broadcast-sized under AQE). Rows with NULL `x` keep NULL in the
    * clamped column; groups whose values are all NULL are dropped (their
    * quantiles do not exist — the filterByQuantile degrade). Output: the
    * input columns plus `<x>_w` (the clamped value). */
  def winsorize(df: DataFrame, group: String, x: String,
                loNum: Int, hiNum: Int, den: Int): DataFrame = {
    require(den >= 2 && loNum >= 0 && loNum <= hiNum && hiNum < den,
      s"need 0 <= loNum <= hiNum < den (den >= 2), got $loNum/$den .. $hiNum/$den")
    require(group != x, s"winsorize: group and value column are both '$x'")
    Seq(group, x).foreach(c => require(!c.startsWith("__"),
      s"winsorize: column name '$c' collides with internal __* names"))
    require(!df.columns.contains(s"${x}_w"),
      s"input already has a '${x}_w' column")
    val cnts = df.filter(col(x).isNotNull)
      .groupBy(col(group), col(x)).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(group).orderBy(x)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cnts
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(group)))
    // rank r lives in exactly one distinct value's [cum−cnt, cum) span,
    // so each min(when(...)) selects exactly one value per group
    def hit(num: Int) = {
      val r = expr(s"CAST($num * __n AS BIGINT) DIV $den")
      col("__cum") - col("__cnt") <= r && r < col("__cum")
    }
    val thr = ranked.groupBy(col(group)).agg(
      min(when(hit(loNum), col(x))).as("__lo"),
      min(when(hit(hiNum), col(x))).as("__hi"))
    df.join(thr, Seq(group))
      // least/greatest SKIP nulls in Spark — without the explicit guard a
      // NULL x would come back as the hi threshold instead of NULL
      .withColumn(s"${x}_w", when(col(x).isNull, lit(null))
        .otherwise(greatest(col("__lo"), least(col("__hi"), col(x)))))
      .drop("__lo", "__hi")
  }

  /** Exact quantile summary table — per group, the VALUE at each
    * requested quantile (num/den fractions, the library's deterministic
    * rank convention: the value at 0-indexed rank ⌊num·n/den⌋ of the
    * group's non-NULL values ascending), plus the group size: the
    * p25/p50/p75 report every metrics dashboard and feature-scaling
    * audit starts from, with none of approx_percentile's
    * partition-dependence. Output: (<group>, q_num, q_den, v, n),
    * ordered by (group, q_num·den'… as fraction).
    *
    * FREQUENCY-COMPRESSED like [[winsorize]]: one map-side-combined
    * (group, x) count, ONE cumulative window over the distinct-value
    * table, and ALL requested quantiles read off it in a single
    * conditional aggregation — adding quantiles adds agg columns, never
    * passes. The per-group row then unpivots via a stack Generate over
    * O(#groups) rows. Groups whose values are all NULL are dropped. */
  def quantileSummary(df: DataFrame, group: String, x: String,
                      qs: Seq[(Int, Int)] = Seq((1, 4), (2, 4), (3, 4)))
      : DataFrame = {
    require(qs.nonEmpty, "quantileSummary needs at least one quantile")
    qs.foreach { case (num, den) => require(den >= 1 && num >= 0 && num < den,
      s"need 0 <= num < den, got $num/$den") }
    require(qs.distinct.size == qs.size, s"duplicate quantiles in $qs")
    require(group != x, s"quantileSummary: group and value are both '$x'")
    Seq(group, x).foreach(c => require(!c.startsWith("__"),
      s"quantileSummary: column name '$c' collides with internal __* names"))
    val cnts = df.filter(col(x).isNotNull)
      .groupBy(col(group), col(x)).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(group).orderBy(x)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = cnts
      .withColumn("__cum", sum("__cnt").over(w))
      .withColumn("__n", sum("__cnt").over(Window.partitionBy(group)))
    def hit(num: Int, den: Int) = {
      val r = expr(s"CAST($num * __n AS BIGINT) DIV $den")
      col("__cum") - col("__cnt") <= r && r < col("__cum")
    }
    val aggs = qs.zipWithIndex.map { case ((num, den), i) =>
      min(when(hit(num, den), col(x))).as(s"__q$i")
    } :+ max("__n").as("__gn")
    val perGroup = ranked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = qs.zipWithIndex.map { case ((num, den), i) =>
      s"${num}L, ${den}L, __q$i"
    }.mkString(", ")
    perGroup.select(col(group),
        expr(s"stack(${qs.size}, $stackArgs) AS (q_num, q_den, v)"),
        col("__gn").as("n"))
      .select(col(group), col("q_num"), col("q_den"), col("v"), col("n"))
      .orderBy(col(group), col("q_num") * lit(1000000L) / col("q_den"))
  }

  /** Algebraic per-key aggregate STATE over a BIGINT column — the
    * mergeable unit of incremental (materialized-view) maintenance:
    * yesterday's state ⊕ tonight's insert-only delta = today's state,
    * with no recompute over history. (n counts non-NULL `x`, matching
    * SQL COUNT(x); sum/min/max ignore NULLs the same way.) Output:
    * (<key>, n, sum_x, min_x, max_x). */
  def aggState(df: DataFrame, key: String, x: String): DataFrame =
    df.groupBy(col(key)).agg(count(col(x)).as("n"), sum(col(x)).as("sum_x"),
      min(col(x)).as("min_x"), max(col(x)).as("max_x"))

  /** Merges two [[aggState]] tables: one co-partitioned full-outer join,
    * counts/sums add, min/max fold null-safely (a key absent from one
    * side keeps the other side's statistics unchanged). Associative and
    * commutative — state tables combine in any batch order, which is
    * what lets a 1000-partition nightly delta merge without touching the
    * base table's history. The result IS [[aggState]] of the
    * concatenated inputs (spec-pinned). */
  def mergeAggStates(state: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val expect = Seq(key, "n", "sum_x", "min_x", "max_x")
    Seq(state -> "state", delta -> "delta").foreach { case (df, side) =>
      require(df.columns.toSeq == expect,
        s"$side columns must be exactly $expect, got ${df.columns.toSeq}")
    }
    val a = state.select(col(key), col("n").as("__n1"), col("sum_x").as("__s1"),
      col("min_x").as("__mn1"), col("max_x").as("__mx1"))
    val b = delta.select(col(key), col("n").as("__n2"), col("sum_x").as("__s2"),
      col("min_x").as("__mn2"), col("max_x").as("__mx2"))
    a.join(b, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("__n1"), lit(0L)) + coalesce(col("__n2"), lit(0L))).as("n"),
        // both-NULL stays NULL (an all-NULL x key sums to NULL in
        // aggState; 0 here would diverge from the recompute)
        when(col("__s1").isNull && col("__s2").isNull, lit(null))
          .otherwise(coalesce(col("__s1"), lit(0L)) + coalesce(col("__s2"), lit(0L)))
          .as("sum_x"),
        // least/greatest skip NULLs in Spark, so a one-sided key keeps
        // its own min/max; an all-NULL x keeps NULL
        least(col("__mn1"), col("__mn2")).as("min_x"),
        greatest(col("__mx1"), col("__mx2")).as("max_x"))
  }

  /** Column profile — the data-quality summary every ingestion pipeline
    * runs before trusting a new extract: per column, total rows, null
    * count, and EXACT distinct count. Output: (col_name, n_rows, n_nulls,
    * n_distinct), ordered by column name.
    *
    * One pass: each row explodes to (#cols) (name, value-as-string) pairs
    * and a single hash aggregation per name computes all three stats —
    * the per-group single-distinct plans as a two-phase partial-distinct
    * aggregate, no Expand over the whole row set per statistic. The
    * string cast is per-engine-injective for the primitive types profiled
    * here, so distinct counts agree with an oracle counting native
    * values. At 100 TB the explode multiplies shuffle input by #cols;
    * profile a column subset (the `cols` parameter) when the table is
    * wide. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val pairs = array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast(StringType).as("v"))): _*)
    df.select(explode(pairs).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        count_distinct(col("v")).as("n_distinct"))
      .orderBy("col_name")
  }

  /** WIDE-TABLE form of [[profile]] — same output, no ×#cols row
    * multiplication. One job per column: the scan prunes to that single
    * column (columnar formats read exactly one column per job, so total
    * scan I/O across all jobs equals ONE full-width pass), a map-side-
    * combined `groupBy(value).count` compresses to the column's distinct
    * values — the O(distinct) exchange — and rows / nulls / distinct all
    * derive from that tiny grouped table. No Expand (the fused
    * distinct+non-distinct aggregate doubles its input; this pass touches
    * each row once) and per-job state is one column's distinct set, not
    * every profiled column's at once. The explode form remains the right
    * call for narrow tables (one job, no per-column scheduling); past a
    * few dozen columns this is the shape that holds. */
  def profileBatched(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    cols.map { c =>
      df.select(col(c).cast(StringType).as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum("cnt"), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }.reduce(_.unionAll(_)).orderBy("col_name")
  }

  /** Min-max feature scaling — each BIGINT `x` mapped to its group's
    * `(x − min) · scale div (max − min)` (0..scale inclusive), the
    * bounded-range normalization ML feature pipelines apply where the
    * raw units are meaningless. EXACT: integer arithmetic end to end
    * (both operands non-negative, so Spark's truncating `div` and
    * DuckDB's flooring `//` agree) — no float division, no cross-engine
    * drift. NULL `x` stays NULL; a constant group (max = min) scales to
    * 0 by convention (documented, spec-pinned).
    *
    * Scale shape: ONE map-side-combined (group → min, max) aggregation —
    * O(#groups) rows — joined back (broadcast-sized under AQE); the data
    * never meets a window. The span·scale product is overflow-guarded
    * per GROUP (O(#groups) checks, not per row): a group span above
    * Long.Max / scale raises instead of wrapping. Output: the input
    * columns plus `<x>_mm`. */
  def minmaxScale(df: DataFrame, group: String, x: String,
                  scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    require(group != x, s"minmaxScale: group and value column are both '$x'")
    Seq(group, x).foreach(c => require(!c.startsWith("__"),
      s"minmaxScale: column name '$c' collides with internal __* names"))
    require(!df.columns.contains(s"${x}_mm"),
      s"input already has a '${x}_mm' column")
    val stats = df.filter(col(x).isNotNull)
      .groupBy(col(group))
      .agg(min(col(x)).as("__mn"), max(col(x)).as("__mx"))
      // guard the span BEFORE it multiplies: (mx − mn) · scale must fit
      // Int64 — checked once per group, raises loudly instead of wrapping
      .withColumn("__mx", when(
        col("__mx") - col("__mn") > lit(Long.MaxValue / scale),
        raise_error(concat(lit(s"minmaxScale: group span * $scale " +
          "overflows Int64 for group "), col(group).cast(StringType))))
        .otherwise(col("__mx")))
    df.join(stats, Seq(group), "left")
      .withColumn(s"${x}_mm",
        when(col(x).isNull, lit(null).cast(LongType))
          .when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(expr(s"(($x - __mn) * ${scale}L) div (__mx - __mn)")))
      .drop("__mn", "__mx")
  }

  /** Pairwise-exact correlation statistics over every pair of BIGINT
    * columns — the feature-redundancy screen run before model training
    * (drop one of two near-collinear features) and the
    * [[linregStats]] generalization from one (x, y) to the full matrix.
    * For each unordered pair (x, y), over PAIRWISE-COMPLETE rows (both
    * non-NULL): n and the five power sums as BIGINT — the mergeable
    * algebraic state (the [[aggState]] discipline: state(A) + state(B) =
    * state(A∪B), so shards/days combine without recompute) — plus the
    * moment forms cov_num = n·Σxy − Σx·Σy, var_x = n·Σxx − (Σx)², var_y
    * as EXACT DECIMAL(38,0) (the n·Σ products overflow Int64 as soon as
    * n²·x̄² passes 9.2e18 — real already for cents at 10^5 rows — while
    * 38 digits hold to 10^9 rows of 10^7-unit cents with room to spare).
    * Pearson's r² is cov_num² / (var_x · var_y), sign(r) = sign(cov_num);
    * everything replays cell-for-cell in any engine (float covariance
    * drifts with summation order). Int64 bound on the SUMS: n·x̄² under
    * 9.2e18 — rescale units past that (the [[linregStats]] contract).
    *
    * Scale shape: ONE shared map-side-combined scan computes all
    * 6·C(k,2) conditional aggregates into a single row; the row→pairs
    * reshape is a `stack` Generate over that ONE row (the expectations
    * discipline — never a row-multiplying Expand over the data). */
  def corrPairs(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrPairs needs at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
      require(!c.contains("'"), s"corrPairs: column name '$c' contains a quote")
    }
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), k) =>
      val both = col(x).isNotNull && col(y).isNotNull
      Seq(
        count(when(both, lit(1))).as(s"__n$k"),
        coalesce(sum(when(both, col(x))), lit(0L)).as(s"__sx$k"),
        coalesce(sum(when(both, col(y))), lit(0L)).as(s"__sy$k"),
        coalesce(sum(when(both, col(x) * col(x))), lit(0L)).as(s"__sxx$k"),
        coalesce(sum(when(both, col(y) * col(y))), lit(0L)).as(s"__syy$k"),
        coalesce(sum(when(both, col(x) * col(y))), lit(0L)).as(s"__sxy$k"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.zipWithIndex.map { case ((x, y), k) =>
      s"'$x', '$y', __n$k, __sx$k, __sy$k, __sxx$k, __syy$k, __sxy$k"
    }.mkString(", ")
    // widen BEFORE multiplying: the products live in decimal(38,0)
    def d(c: String) = col(c).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    one.select(expr(s"stack(${pairs.size}, $stackArgs) AS " +
        "(x_col, y_col, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy)"))
      .withColumn("cov_num",
        (d("n") * d("sum_xy") - d("sum_x") * d("sum_y"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .withColumn("var_x",
        (d("n") * d("sum_xx") - d("sum_x") * d("sum_x"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .withColumn("var_y",
        (d("n") * d("sum_yy") - d("sum_y") * d("sum_y"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
      .orderBy("x_col", "y_col")
  }

  /** Unpivot / melt — wide measures to long (id..., var, val) rows, the
    * reshape feeding per-metric operators ([[histogram]], [[madPerGroup]],
    * [[percentRanks]]) from a wide fact table without k separate scans.
    * NULL measures are KEPT (a missing reading is data — DuckDB's UNPIVOT
    * default drops them, so the oracle uses the UNION ALL form); `var`
    * carries the source column name. Value columns must share one type
    * (Spark's unpivot requires it — a mixed set raises at plan time).
    *
    * Scale shape: Spark's native Expand — each input row fans out to
    * exactly |valueCols| narrow rows in the same task, no shuffle, no
    * window; the ×k row growth is the operator's contract, not a
    * planning accident. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "var", valName: String = "val"): DataFrame = {
    require(idCols.nonEmpty && valueCols.nonEmpty,
      "melt needs id columns and value columns")
    (idCols ++ valueCols).foreach(c =>
      require(df.columns.contains(c), s"no such column: $c"))
    require(idCols.intersect(valueCols).isEmpty,
      s"columns in both id and value sets: ${idCols.intersect(valueCols)}")
    Seq(varName, valName).foreach(c => require(!idCols.contains(c),
      s"output column '$c' collides with an id column"))
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
  }

  /** Equi-depth (equal-frequency) histogram — partition a BIGINT column's
    * value domain into `nBuckets` buckets holding ~n/nBuckets rows each:
    * the boundary computation behind range-partitioned layouts, quantile
    * sketch validation, and "decile report" analytics. Every row of a
    * given value lands in ONE bucket (bucket = rows-strictly-below ·
    * nBuckets div n — value-deterministic, unlike NTILE which splits
    * ties by arbitrary row order), so the output is engine-replayable.
    * Output per non-empty bucket: (bucket, lo, hi, n_rows, n_distinct),
    * bucket-ascending; heavy values may overfill their bucket (exactness
    * over balance — the documented equi-depth trade).
    *
    * Scale shape: FREQUENCY-COMPRESSED like [[madPerGroup]] — one
    * map-side-combined distinct-value count, then the global cumulative
    * rank runs as a [[PrefixSum]] two-pass range scan over the O(distinct
    * values) table (NEVER a partitionless window — that is one task
    * holding the domain); the total row count is an O(1) driver scalar
    * folded into the bucket projection. NULLs are excluded (they have no
    * rank); n · nBuckets is overflow-guarded. */
  def equiDepthBuckets(df: DataFrame, x: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(!x.startsWith("__"),
      s"equiDepthBuckets: column name '$x' collides with internal __* names")
    val cnts = df.filter(col(x).isNotNull)
      .groupBy(col(x)).agg(count(lit(1)).as("__cnt"))
    // O(1) scalar collect (bounded driver state, the resample/decayedScore
    // class); null only when the input is empty — output is empty anyway
    val nRow = cnts.agg(sum("__cnt")).head
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n <= Long.MaxValue / math.max(nBuckets, 1),
      s"equiDepthBuckets: n * nBuckets overflows Int64 (n=$n)")
    if (n == 0L) {
      val s = df.sparkSession
      import s.implicits._
      return Seq.empty[(Long, Long, Long, Long, Long)]
        .toDF("bucket", "lo", "hi", "n_rows", "n_distinct")
    }
    PrefixSum.exclusive(cnts, "__cnt", "__below", numParts = -1, col(x))
      .withColumn("bucket", expr(s"(__below * $nBuckets) div ${n}L"))
      .groupBy("bucket")
      .agg(min(col(x)).as("lo"), max(col(x)).as("hi"),
        sum("__cnt").as("n_rows"), count(lit(1)).as("n_distinct"))
      .orderBy("bucket")
  }
}

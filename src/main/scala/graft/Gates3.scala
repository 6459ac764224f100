package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Gate-registry shard 3 (q114–q169): each gate's Spark lambda and
  * its DuckDB oracle SQL side by side — pure relocation of the
  * [[SparkEntry]] registry (r15 verdict #6), no behavior change.
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] assemble the shards.
  */
private[graft] object Gates3 {
  import GateSupport._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ── interval × interval overlap join: user sessions (30-min gap
    // intervals) vs a synthesized 90-min incident-window schedule; both
    // sides bucket-exploded to an hour-cell equi join, each pair kept
    // exactly once in its first shared cell (no distinct pass) ───────────
    "q114_interval_overlap" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val sess = EventOps.sessionIntervals(ev, gapSec = 1800)
        .select("user_id", "session_id", "s_start", "s_end")
      val wins = ev.select(EventOps.tsMicros(ev).as("tus"))
        .agg(min("tus").as("tmin"))
        .select(explode(sequence(lit(0L), lit(47L))).as("w_id"), col("tmin"))
        .select(col("w_id"),
          (col("tmin") + col("w_id") * 21600000000L).as("w_start"),
          (col("tmin") + col("w_id") * 21600000000L + 5400000000L).as("w_end"))
      graft.events.RangeJoin.intervalOverlap(
        sess, "s_start", "s_end", wins, "w_start", "w_end",
        bucketWidth = 3600000000L)
        .select(col("user_id"), col("session_id"), col("w_id"),
          (least(col("s_end"), col("w_end")) -
            greatest(col("s_start"), col("w_start")) + 1).as("overlap_us"))
        .orderBy("user_id", "session_id", "w_id")
    }),

    // ── column profile of orders: per column, rows / nulls / EXACT
    // distinct in one explode + single hash agg (two-phase partial
    // distinct — no per-statistic pass over the table) ───────────────────
    "q115_profile" -> ((s, dir) =>
      graft.operators.TableOps.profile(s.read.parquet(t(dir, "orders")),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))),

    // ── triangle enumeration over the part co-purchase graph (pairs in
    // ≥2 distinct orders): degree-ordered orientation bounds every
    // outdegree at O(√m), so wedge generation survives hub skew ──────────
    "q116_triangles" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      // per-order pair explosion is O(k²) with k = lines per order (≤ 7
      // in this schema) — bounded per group, not per corpus
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).select(col("pa"), col("pb"))
      graft.graph.Triangles.triangles(pairs, "pa", "pb")
    }),

    // ── exact OLS sufficient statistics per event type: y = value cents
    // vs x = hour offset from the corpus origin (driver scalar — keeps
    // n·Σx² inside Int64); slope as an exact integer fraction ────────────
    "q117_linreg_stats" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val e = ev.select(col("event_type"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("y"),
        EventOps.tsMicros(ev).as("tus"))
      val hminRow = e.agg(min(expr("tus div 3600000000"))).head
      val hmin = if (hminRow.isNullAt(0)) 0L else hminRow.getLong(0)
      val xy = e.select(col("event_type"),
        (expr("tus div 3600000000") - hmin).as("x"), col("y"))
      graft.operators.TableOps.linregStats(xy, "event_type", "x", "y")
    }),

    // ── Morton (Z-order) codes for (l_partkey, l_suppkey): the
    // two-dimensional clustering key saveZOrdered range-partitions on;
    // pure shift/mask codegen, oracle replays the interleave bit-exact.
    // SF CEILING: bits=21 covers l_partkey/l_suppkey < 2^21 ≈ 2.1M, i.e.
    // TPC-H SF ≲ 10.5 (partkey max = 200000·SF); beyond that the gate's
    // raise_error fires — a production caller derives bits from a max()
    // scan of the key columns (the z values change with bits, so the
    // gate pins a constant to keep the oracle bit-exact) ─────────────────
    "q118_zorder" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast(LongType).as("l_linenumber"),
          graft.sources.Layout.zorderValue(
            col("l_partkey"), col("l_suppkey"), bits = 21).as("z"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ── latest-wins changelog merge (CDC / MERGE): two update waves, a
    // delete wave, and shifted-key inserts applied to the orders
    // snapshot; the changelog collapses map-side before ONE
    // co-partitioned full-outer join — the 100 TB daily-merge shape ─────
    "q119_cdc_merge" -> ((s, dir) => {
      val base = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey").as("k"),
          cents(col("o_totalprice")).as("price_c"),
          col("o_orderstatus").as("status"))
      val upd1 = base.filter(col("k") % 5 === 0)
        .select(col("k"), (col("price_c") + 10000L).as("price_c"),
          col("status"), lit("U").as("op"), lit(1L).as("seq"))
      val upd2 = base.filter(col("k") % 15 === 0)
        .select(col("k"), (col("price_c") + 20000L).as("price_c"),
          col("status"), lit("U").as("op"), lit(2L).as("seq"))
      val dels = base.filter(col("k") % 7 === 0)
        .select(col("k"), lit(null).cast(LongType).as("price_c"),
          lit(null).cast(StringType).as("status"),
          lit("D").as("op"), lit(3L).as("seq"))
      val ins = base.filter(col("k") % 11 === 0)
        .select((col("k") + 100000000L).as("k"),
          (col("price_c") + 5000L).as("price_c"),
          col("status"), lit("U").as("op"), lit(1L).as("seq"))
      graft.operators.TableOps.applyChangelog(
        base, upd1.union(upd2).union(dels).union(ins), "k")
    }),

    // ── contiguous event-type trigram counts per user stream: all leads
    // in ONE user window pass, then a map-side-combined count ────────────
    "q120_type_trigrams" -> ((s, dir) =>
      EventOps.typeNgrams(s.read.parquet(t(dir, "events")), n = 3)),

    // ── 3-core of the part co-purchase graph after 3 bounded peel
    // rounds (deterministic round count → exact SQL replay; convergence
    // inside the bound is a no-op for the replay) ────────────────────────
    "q121_kcore" -> ((s, dir) => {
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).select(col("pa"), col("pb"))
      graft.graph.KCore.kCore(pairs, "pa", "pb", k = 3, maxPeels = 3)
    }),

    // ── multi-source BFS hop distance from the %97 seed parts over the
    // co-purchase graph, 4 bounded relaxation rounds (chained-CTE
    // replayable; per-round exchange is the label table only) ────────────
    "q123_bfs" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).select(col("pa"), col("pb"))
      val seeds = pairs.select(col("pa").as("n"))
        .union(pairs.select(col("pb").as("n")))
        .filter(col("n") % 97 === 0).distinct()
      graft.graph.Bfs.hopDistance(pairs, "pa", "pb", seeds, "n", maxHops = 4)
    }),

    // ── 3-dimensional Morton code (part, supplier, linenumber): the
    // N-dim clustering generalization; bit i of dim j at position 3i+j.
    // SF CEILING: bits=18 covers keys < 2^18 ≈ 262k, i.e. TPC-H SF ≲ 1.31
    // (partkey max = 200000·SF) — past that the raise_error fires; derive
    // bits from a key max() in production (constant here keeps the
    // oracle's interleave expression bit-exact) ──────────────────────────
    "q127_zorder3" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"),
          col("l_linenumber").cast(LongType).as("l_linenumber"),
          graft.sources.Layout.zorderValueN(
            Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
            bits = 18).as("z3"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ── WEIGHTED PageRank over the co-purchase graph: edge weight = the
    // pair's co-occurrence count, contribution = rank·w div Σw — same
    // exact fixed-point arithmetic as q111 (w ≡ 1 is that gate) ──────────
    "q126_weighted_pagerank" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val e0 = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").cast(LongType).as("pa"),
          col("y.p").cast(LongType).as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2)
      val edges = e0.union(
        e0.select(col("pb").as("pa"), col("pa").as("pb"), col("m")))
      graft.graph.PageRank.pageRank(edges, "pa", "pb", iterations = 3,
          weightCol = Some("m"))
        .select(col("node"), col("rank").as("pr"))
    }),

    // ── debounce: drop events whose same-(user,type) predecessor is
    // within 60 s — telemetry double-fire suppression; one lag window ────
    "q124_debounce" -> ((s, dir) =>
      EventOps.debounce(s.read.parquet(t(dir, "events")), windowSec = 60)),

    // ── per-user inter-arrival gap stats with an exact lower-median in
    // ms via the frequency-compressed rank scan (never a per-user raw
    // sort beyond the one lag window) ────────────────────────────────────
    "q125_gap_stats" -> ((s, dir) =>
      EventOps.gapStats(s.read.parquet(t(dir, "events")))),

    // ── median absolute deviation of value cents per event type: both
    // medians are LOWER order statistics (rank ceil(n/2)) — exact,
    // interpolation-free, engine-replayable robust spread ────────────────
    "q122_mad" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      graft.operators.TableOps.madPerGroup(
        ev.select(col("event_type"), cents(col("value")).as("c")),
        "event_type", "c")
    }),

    // ── WIDE-TABLE column profile (batched path): one pruned single-
    // column job per column, groupBy(value) frequency compression — no
    // ×#cols explode, no Expand; peak per-stage shuffle is O(rows) not
    // O(#cols·rows) (ProfileBatchedSpec pins the bound) ──────────────────
    "q128_profile_batched" -> ((s, dir) =>
      graft.operators.TableOps.profileBatched(s.read.parquet(t(dir, "lineitem")),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate"))),

    // ── CDC COMPACTION LOOP: three changelog batches applied in order
    // (per-batch seqs restart at 1 — ordering comes from batch position),
    // with delete-then-revive ACROSS batches: %7 keys die in batch 1,
    // revive in batch 2; %3 keys die in batch 2, the %9 subset revives in
    // batch 3. Each merged snapshot is lineage-truncated and the consumed
    // round released (the PageRank loop discipline); ONE global sort at
    // the end, one collapse + one full-outer join per batch ──────────────
    "q129_cdc_compaction" -> ((s, dir) => {
      val base = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey").as("k"),
          cents(col("o_totalprice")).as("price_c"),
          col("o_orderstatus").as("status"))
      def u(cond: Column, delta: Long, seq: Long) =
        base.filter(cond).select(col("k"),
          (col("price_c") + delta).as("price_c"), col("status"),
          lit("U").as("op"), lit(seq).as("seq"))
      def d(cond: Column, seq: Long) =
        base.filter(cond).select(col("k"),
          lit(null).cast(LongType).as("price_c"),
          lit(null).cast(StringType).as("status"),
          lit("D").as("op"), lit(seq).as("seq"))
      val b1 = u(col("k") % 5 === 0, 10000L, 1L).union(d(col("k") % 7 === 0, 2L))
      val b2 = u(col("k") % 7 === 0, 777L, 1L).union(d(col("k") % 3 === 0, 2L))
      val b3 = u(col("k") % 9 === 0, 99L, 1L)
      graft.operators.TableOps.applyChangelogs(base, Seq(b1, b2, b3), "k")
    }),

    // ── label-propagation communities (2 synchronous rounds) over the
    // part co-purchase graph: plurality neighbor vote, smallest-label
    // tiebreak — deterministic, chained-CTE-replayable; per-round
    // exchange is label FREQUENCIES (map-side-combined), not edges ───────
    "q130_label_prop" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).select(col("pa"), col("pb"))
      graft.graph.LabelProp.labelPropagation(pairs, "pa", "pb", rounds = 2)
    }),

    // ── gaps-and-islands: per-user maximal runs of consecutive active
    // days via the constant-minus-rank trick — distinct user-days first
    // (O(active days) exchange), one per-user window, one agg ────────────
    "q131_streaks" -> ((s, dir) =>
      EventOps.activityStreaks(s.read.parquet(t(dir, "events")))),

    // ── multi-source WEIGHTED shortest paths (Bellman-Ford, 3 bounded
    // relaxation rounds) over the co-purchase graph; edge weight derived
    // deterministically from the endpoints so the chained-CTE oracle
    // replays cost-for-cost; non-negative weights enforced ───────────────
    "q132_sssp" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").cast(LongType).as("pa"),
          col("y.p").cast(LongType).as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2)
        .select(col("pa"), col("pb"),
          (lit(1L) + (col("pa") + col("pb")) % 5).as("w"))
      val seeds = pairs.select(col("pa").as("n"))
        .union(pairs.select(col("pb").as("n")))
        .filter(col("n") % 97 === 0).distinct()
      graft.graph.Bfs.shortestPaths(pairs, "pa", "pb", Some("w"),
        seeds, "n", maxRounds = 3)
    }),

    // ── local clustering coefficient over the co-purchase graph as an
    // exact integer fraction 2·tri(n) / (deg·(deg−1)); one canonical-
    // edge checkpoint feeds the degree agg and the hub-proof triangle
    // pass — community DENSITY beside q130's community LABELS ───────────
    "q133_clustering_coeff" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      val pairs = op.as("x").join(op.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
        .agg(count(lit(1)).as("m"))
        .filter(col("m") >= 2).select(col("pa"), col("pb"))
      graft.graph.Triangles.clusteringCoefficient(pairs, "pa", "pb")
    }),

    // ── exact percent-rank table per event type over value cents:
    // frequency-compressed (counts first, window over distinct values
    // only) — rank-based feature scaling as integer fractions ────────────
    "q134_percent_ranks" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      graft.operators.TableOps.percentRanks(
        ev.select(col("event_type"), cents(col("value")).as("c")),
        "event_type", "c")
    }),

    // ── exact 7-day-actives curve: distinct users per trailing 7-day
    // window at each observed day, via the first-in-window ±1 delta trick
    // — O(distinct user-days) exchange, a PrefixSum over O(days), never a
    // ×7 replication or a distinct-over-window ───────────────────────────
    "q135_sliding_distinct" -> ((s, dir) =>
      EventOps.slidingDistinctUsers(
        s.read.parquet(t(dir, "events")), windowDays = 7)),

    // ── warehouse ROLLUP: subtotal + grand-total rows in one pass (the
    // Expand operator), grouping flags folded to 'ALL' labels so both
    // engines sort and hash identical cells ──────────────────────────────
    "q136_rollup" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_extendedprice")).as("p"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum("p").as("sum_price_c"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .select(
          when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("rf"),
          when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("ls"),
          col("n"), col("sum_price_c"))
        .orderBy("rf", "ls")),

    // ── pivot (crosstab): per-linestatus price sums spread across the
    // pinned returnflag domain — one hash aggregate, no joins; absent
    // cells coalesce to 0 in both engines ────────────────────────────────
    "q137_pivot" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_linestatus"), col("l_returnflag"),
          cents(col("l_extendedprice")).as("p"))
        .groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum("p"))
        .select(col("l_linestatus"),
          coalesce(col("A"), lit(0L)).as("sum_a"),
          coalesce(col("N"), lit(0L)).as("sum_n"),
          coalesce(col("R"), lit(0L)).as("sum_r"))
        .orderBy("l_linestatus")),

    // ── market-basket pair mining with exact lift fractions: orders are
    // baskets, parts are items; A-Priori prune before the quadratic pair
    // self-join ──────────────────────────────────────────────────────────
    "q138_frequent_pairs" -> ((s, dir) =>
      graft.operators.Association.frequentPairs(
        s.read.parquet(t(dir, "lineitem")),
        basketCol = "l_orderkey", itemCol = "l_partkey", minSupport = 2L)),

    // ── winsorize event value cents to the [5%, 95%] exact per-type
    // quantile band — frequency-compressed thresholds, one clamp join ───
    "q139_winsorize" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .select(col("event_id"), col("event_type"), cents(col("value")).as("c"))
      graft.operators.TableOps.winsorize(ev, "event_type", "c",
          loNum = 1, hiNum = 19, den = 20)
        .select(col("event_id"), col("event_type"), col("c"), col("c_w"))
        .orderBy("event_id")
    }),

    // ── declarative data-quality expectations over orders: one shared
    // conditional-agg pass for the row-local rules + a column-pruned
    // cardinality pass for uniqueness; range pinned to force a nonzero
    // violation count ────────────────────────────────────────────────────
    "q140_expectations" -> ((s, dir) => {
      import graft.operators.Quality._
      expectations(s.read.parquet(t(dir, "orders")), Seq(
        ExpectNotNull("o_custkey"),
        ExpectUnique("o_orderkey"),
        ExpectAccepted("o_orderstatus", Seq("F", "O", "P")),
        ExpectRange("o_custkey", 1L, 1000L)))
        .withColumn("pass", col("pass").cast(LongType))
    }),

    // ── incremental aggregate maintenance: per-customer order-total
    // state built over two disjoint halves, merged — must equal the
    // direct aggregate over everything (the algebraic-merge contract) ────
    "q141_agg_state_merge" -> ((s, dir) => {
      val ord = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("v"))
      val sA = graft.operators.TableOps.aggState(
        ord.filter(col("o_orderkey") % 2 === 0), "o_custkey", "v")
      val sB = graft.operators.TableOps.aggState(
        ord.filter(col("o_orderkey") % 2 === 1), "o_custkey", "v")
      graft.operators.TableOps.mergeAggStates(sA, sB, "o_custkey")
        .orderBy("o_custkey")
    }),

    // ── ORC round-trip: orders written as zstd ORC and read back must be
    // value-identical to the parquet original (the Hive-era interchange
    // format; oracle reads the parquet — DuckDB has no ORC reader, so
    // equality to it IS the round-trip proof) ────────────────────────────
    "q143_orc_roundtrip" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_orc_rt"
      graft.sources.Orc.save(
        s.read.parquet(t(dir, "orders"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            cents(col("o_totalprice")).as("price_c")),
        out, numFiles = 4)
      graft.sources.Orc.read(s, out).orderBy("o_orderkey")
    }),

    // ── exact per-user time-weighted average of event value: one lead
    // window + one aggregation; the holding average a plain mean gets
    // wrong under bursts ─────────────────────────────────────────────────
    "q147_twap" -> ((s, dir) =>
      EventOps.timeWeightedAvg(s.read.parquet(t(dir, "events")))),

    // ── HITS hubs & authorities (2 rounds) over the directed
    // part→supplier interaction graph: exact max-rescaled fixed-point
    // integer arithmetic so DuckDB replays every round cell-for-cell; the
    // bipartite sides naturally carry hub (parts) / authority (suppliers)
    "q148_hits" -> ((s, dir) => {
      val e = s.read.parquet(t(dir, "lineitem"))
        .select((col("l_partkey") * 2).cast(LongType).as("s"),
          (col("l_suppkey") * 2 + 1).cast(LongType).as("d")).distinct()
      graft.graph.Hits.hits(e, "s", "d", iterations = 2)
    }),

    // ── reciprocal-rank fusion of two per-type user rankings (count vs
    // spend): integer-division RRF points so the fused score is exact;
    // map-side-combined point sum, candidate-set window only ─────────────
    "q150_rrf_fusion" -> ((s, dir) => {
      // the per-(type,user) aggregate feeds BOTH ranking windows — no
      // cross-branch CSE in Spark, so materialize it once
      val agg = graft.operators.Checkpoints.checkpoint(
        s.read.parquet(t(dir, "events"))
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("spend")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      val byN = agg.select(col("event_type"), col("user_id"),
        row_number().over(w.orderBy(col("n").desc, col("user_id"))).as("rank"))
      val bySpend = agg.select(col("event_type"), col("user_id"),
        row_number().over(w.orderBy(col("spend").desc, col("user_id"))).as("rank"))
      graft.text.Retrieval.rrfFuse(byN.union(bySpend),
        "event_type", "user_id", "rank", k = 10)
    }),

    // ── per-user Gini impurity of the event-type distribution: exact
    // integer fractions, frequency-compressed — behavioral diversity
    // (0 = single-type user, →1 = uniform over many types) ───────────────
    "q151_gini" -> ((s, dir) =>
      graft.operators.TableOps.giniImpurity(
        s.read.parquet(t(dir, "events")), "user_id", "event_type")),

    // ── per-user EWMA (α = 3/10) over the trailing 32 events: exact
    // Int64 fixed-point fold via a codegen aggregate() lambda — the
    // lastN cap bounds per-user state and the oracle's replay depth ──────
    "q152_ewma" -> ((s, dir) =>
      EventOps.ewma(s.read.parquet(t(dir, "events")),
        alphaNum = 3L, alphaDen = 10L, lastN = 32)),

    // ── streaming frequent-keys maintainer: event types replayed in 3
    // micro-batches through the Misra-Gries fold; k = 64 exceeds the
    // distinct-type count so dec = 0 and the bounds COLLAPSE — the
    // snapshot must equal the exact GROUP BY (the decrement path is
    // property-specced where no SQL oracle can follow) ───────────────────
    "q154_stream_topk" -> ((s, dir) => {
      import s.implicits._
      val keys = s.read.parquet(t(dir, "events"))
        .select(col("event_type").cast(StringType)).as[String]
      graft.streaming.EventStreaming.topkReplay(keys, k = 64, nChunks = 3)
    }),

    // ── zero-floor running balance per customer: max(0, y+Δ) via the
    // closed form S − min(prefix-min S, 0) — two partitioned windows
    // replace the sequential clamp fold ──────────────────────────────────
    "q163_zero_floor" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "orders"))
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("o_orderstatus") === "O", cents(col("o_totalprice")))
            .otherwise(-cents(col("o_totalprice"))).as("delta"))
      graft.operators.TableOps.zeroFloorBalance(
        d, "o_custkey", "o_orderkey", "delta")
    }),

    // ── linear multi-touch attribution: purchases split their cents
    // equally (as exact fractions) over the hour's click/view touches;
    // (user, bucket) equi-join — never a cross-user bucket join ──────────
    "q164_attribution" -> ((s, dir) =>
      EventOps.linearAttribution(s.read.parquet(t(dir, "events")),
        "purchase", Seq("click", "view"), windowUs = 3600000000L)),

    // ── cohort LTV curve: cumulative purchase cents by days-since-first
    // activity per signup cohort; raw events never meet a window ─────────
    "q165_cohort_ltv" -> ((s, dir) =>
      EventOps.cohortLtv(s.read.parquet(t(dir, "events")), "purchase")),

    // ── U-shaped attribution: 400/200/400 permille position weights as
    // exact fractions over the same (user, bucket) pair machinery ────────
    "q166_position_attribution" -> ((s, dir) =>
      EventOps.positionAttribution(s.read.parquet(t(dir, "events")),
        "purchase", Seq("click", "view"), windowUs = 3600000000L)),

    // ── min-max feature scaling: order totals normalized to 0..10^6
    // within their priority class — exact integer scaling, one O(#groups)
    // stats join, overflow-guarded per group ─────────────────────────────
    "q167_minmax_scale" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("c"))
      graft.operators.TableOps.minmaxScale(d, "o_orderpriority", "c")
        .select(col("o_orderkey"), col("o_orderpriority"), col("c"),
          col("c_mm"))
        .orderBy("o_orderkey")
    }),

    // ── equi-depth histogram: event values cut into 8 equal-frequency
    // buckets — frequency-compressed counts + a PrefixSum range scan,
    // never a partitionless window over the domain ───────────────────────
    "q168_equidepth" -> ((s, dir) =>
      graft.operators.TableOps.equiDepthBuckets(
        s.read.parquet(t(dir, "events"))
          .select(cents(col("value")).as("c")),
        "c", nBuckets = 8)),

    // ── exact correlation matrix: all 6 pairs of the lineitem measures
    // in ONE shared scan (6·C(4,2) conditional aggregates into one row,
    // stack-reshaped). The gate compares the BIGINT power sums (the
    // mergeable state); the DECIMAL(38,0) moment forms are spec-pinned
    // (DuckDB's pandas bridge degrades DECIMAL to float64 — not hashable
    // cell-exact across engines) ─────────────────────────────────────────
    "q169_corr_matrix" -> ((s, dir) =>
      // price in WHOLE DOLLARS: Σ(price²) in cents passes 9.2e18 at
      // ~600k rows — the operator's documented rescale-units contract
      graft.operators.TableOps.corrPairs(
        s.read.parquet(t(dir, "lineitem"))
          .select(cents(col("l_quantity")).as("qty_c"),
            floor(col("l_extendedprice")).cast(LongType).as("price_d"),
            cents(col("l_discount")).as("disc_c"),
            cents(col("l_tax")).as("tax_c")),
        Seq("qty_c", "price_d", "disc_c", "tax_c"))
        .select("x_col", "y_col", "n", "sum_x", "sum_y", "sum_xx",
          "sum_yy", "sum_xy")
        .orderBy("x_col", "y_col")),
  )

  val oracles: Seq[(String, String)] = Seq(

    // the bucketing is invisible to semantics: the oracle is the plain
    // inequality overlap join over the same session/window intervals
    "q114_interval_overlap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |s0 AS (SELECT user_id, event_id, tus,
        |         LAG(tus) OVER (PARTITION BY user_id
        |           ORDER BY tus, event_id) AS prev FROM e),
        |s1 AS (SELECT user_id, tus,
        |         CAST(SUM(CASE WHEN prev IS NULL OR tus - prev > 1800000000
        |                       THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY tus, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |       FROM s0),
        |sess AS (SELECT user_id, session_id, MIN(tus) AS s_start,
        |                MAX(tus) AS s_end
        |         FROM s1 GROUP BY user_id, session_id),
        |b AS (SELECT MIN(tus) AS tmin FROM e),
        |w AS (SELECT CAST(g.w_id AS BIGINT) AS w_id,
        |             b.tmin + g.w_id*21600000000 AS w_start,
        |             b.tmin + g.w_id*21600000000 + 5400000000 AS w_end
        |      FROM b, (SELECT UNNEST(generate_series(0, 47)) AS w_id) g)
        |SELECT sess.user_id, sess.session_id, w.w_id,
        |       (LEAST(sess.s_end, w.w_end) -
        |        GREATEST(sess.s_start, w.w_start) + 1) AS overlap_us
        |FROM sess JOIN w
        |  ON sess.s_start <= w.w_end AND w.w_start <= sess.s_end
        |ORDER BY sess.user_id, sess.session_id, w.w_id""".stripMargin,

    "q115_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
        |         COUNT(*) - COUNT(o_orderkey) AS n_nulls,
        |         COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
        |         COUNT(DISTINCT o_custkey) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
        |         COUNT(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
        |         COUNT(DISTINCT o_totalprice) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
        |         COUNT(DISTINCT o_orderdate) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
        |         COUNT(DISTINCT o_orderpriority) FROM orders
        |) ORDER BY col_name""".stripMargin,

    // id-ordered triangle join: a different (simpler) enumeration of the
    // same triangle set the degree-ordered Spark plan produces
    "q116_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |pr AS (SELECT x.p AS a, y.p AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2)
        |SELECT CAST(e1.a AS BIGINT) AS a, CAST(e1.b AS BIGINT) AS b,
        |       CAST(e2.b AS BIGINT) AS c
        |FROM pr e1 JOIN pr e2 ON e2.a = e1.a AND e2.b > e1.b
        |JOIN pr e3 ON e3.a = e1.b AND e3.b = e2.b
        |ORDER BY a, b, c""".stripMargin,

    "q117_linreg_stats" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS y FROM events),
        |m AS (SELECT MIN(h) AS hmin FROM e),
        |xy AS (SELECT event_type, h - m.hmin AS x, y FROM e, m),
        |a AS (SELECT event_type, COUNT(*) AS n,
        |        CAST(SUM(x) AS BIGINT) AS sum_x,
        |        CAST(SUM(y) AS BIGINT) AS sum_y,
        |        CAST(SUM(x*x) AS BIGINT) AS sum_xx,
        |        CAST(SUM(x*y) AS BIGINT) AS sum_xy
        |      FROM xy GROUP BY event_type)
        |SELECT event_type, n, sum_x, sum_y, sum_xx, sum_xy,
        |       n*sum_xy - sum_x*sum_y AS slope_num,
        |       n*sum_xx - sum_x*sum_x AS slope_den
        |FROM a ORDER BY event_type""".stripMargin,

    "q118_zorder" -> {
      val terms = (0 until 21).map(i =>
        s"(((CAST(l_partkey AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
          s"(((CAST(l_suppkey AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       CAST($terms AS BIGINT) AS z
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    // the changelog is synthesized by key arithmetic, so the oracle
    // derives the merged state in closed form — checking the merge
    // machinery against independent ground truth (the q104 pattern)
    "q119_cdc_merge" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
        |                o_orderstatus AS status FROM orders)
        |SELECT k,
        |       CASE WHEN k % 15 = 0 THEN price_c + 20000
        |            WHEN k % 5 = 0 THEN price_c + 10000
        |            ELSE price_c END AS price_c,
        |       status
        |FROM base WHERE k % 7 != 0
        |UNION ALL
        |SELECT k + 100000000 AS k, price_c + 5000 AS price_c, status
        |FROM base WHERE k % 11 = 0
        |ORDER BY k""".stripMargin,

    "q120_type_trigrams" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |l AS (SELECT user_id, event_type AS t0,
        |        LEAD(event_type, 1) OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS t1,
        |        LEAD(event_type, 2) OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS t2
        |      FROM e)
        |SELECT t0, t1, t2, COUNT(*) AS cnt FROM l
        |WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY t0, t1, t2 ORDER BY t0, t1, t2""".stripMargin,

    // three bounded peel rounds replayed as chained CTEs (the q111
    // pattern); convergence before round 3 would make later peels no-ops
    // in both engines
    "q121_kcore" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e0 AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |d1 AS (SELECT n, COUNT(*) AS d FROM (SELECT a AS n FROM e0
        |         UNION ALL SELECT b AS n FROM e0) t GROUP BY n),
        |k1 AS (SELECT n FROM d1 WHERE d >= 3),
        |e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT n FROM k1)
        |                             AND b IN (SELECT n FROM k1)),
        |d2 AS (SELECT n, COUNT(*) AS d FROM (SELECT a AS n FROM e1
        |         UNION ALL SELECT b AS n FROM e1) t GROUP BY n),
        |k2 AS (SELECT n FROM d2 WHERE d >= 3),
        |e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT n FROM k2)
        |                             AND b IN (SELECT n FROM k2)),
        |d3 AS (SELECT n, COUNT(*) AS d FROM (SELECT a AS n FROM e2
        |         UNION ALL SELECT b AS n FROM e2) t GROUP BY n),
        |k3 AS (SELECT n FROM d3 WHERE d >= 3),
        |e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT n FROM k3)
        |                             AND b IN (SELECT n FROM k3))
        |SELECT n, COUNT(*) AS degree FROM (SELECT a AS n FROM e3
        |  UNION ALL SELECT b AS n FROM e3) t
        |GROUP BY n ORDER BY n""".stripMargin,

    "q123_bfs" ->
      """WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e0 AS MATERIALIZED (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |e AS MATERIALIZED (SELECT a AS s, b AS d FROM e0
        |      UNION ALL SELECT b AS s, a AS d FROM e0),
        |d0 AS (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS dist FROM e
        |       WHERE s % 97 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d0
        |         UNION ALL SELECT e.d AS node, d0.dist + 1 AS dist
        |         FROM e JOIN d0 ON e.s = d0.node) t GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d1
        |         UNION ALL SELECT e.d AS node, d1.dist + 1 AS dist
        |         FROM e JOIN d1 ON e.s = d1.node) t GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d2
        |         UNION ALL SELECT e.d AS node, d2.dist + 1 AS dist
        |         FROM e JOIN d2 ON e.s = d2.node) t GROUP BY node),
        |d4 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d3
        |         UNION ALL SELECT e.d AS node, d3.dist + 1 AS dist
        |         FROM e JOIN d3 ON e.s = d3.node) t GROUP BY node)
        |SELECT node, dist FROM d4 ORDER BY node""".stripMargin,

    "q127_zorder3" -> {
      val cols = Seq("l_partkey", "l_suppkey", "l_linenumber")
      val terms = (for (i <- 0 until 18; j <- 0 until 3) yield
        s"(((CAST(${cols(j)} AS BIGINT) >> $i) & 1) << ${i * 3 + j})")
        .mkString(" + ")
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       CAST($terms AS BIGINT) AS z3
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "q126_weighted_pagerank" ->
      """WITH e0 AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b,
        |              COUNT(*) AS m
        |            FROM (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |                  FROM lineitem) x
        |            JOIN (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |                  FROM lineitem) y
        |              ON x.o = y.o AND x.p < y.p
        |            GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |e AS (SELECT a AS s, b AS d, m AS w FROM e0
        |      UNION ALL SELECT b AS s, a AS d, m AS w FROM e0),
        |n AS (SELECT DISTINCT s AS node FROM e),
        |ww AS (SELECT s, CAST(SUM(w) AS BIGINT) AS outw FROM e GROUP BY s),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.d AS node,
        |         CAST(SUM((r0.r * e.w) // ww.outw) AS BIGINT) AS sc
        |       FROM e JOIN r0 ON e.s = r0.node JOIN ww ON ww.s = e.s
        |       GROUP BY e.d),
        |r1 AS (SELECT n.node, 150000 + ((85 * COALESCE(c1.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.d AS node,
        |         CAST(SUM((r1.r * e.w) // ww.outw) AS BIGINT) AS sc
        |       FROM e JOIN r1 ON e.s = r1.node JOIN ww ON ww.s = e.s
        |       GROUP BY e.d),
        |r2 AS (SELECT n.node, 150000 + ((85 * COALESCE(c2.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.d AS node,
        |         CAST(SUM((r2.r * e.w) // ww.outw) AS BIGINT) AS sc
        |       FROM e JOIN r2 ON e.s = r2.node JOIN ww ON ww.s = e.s
        |       GROUP BY e.d),
        |r3 AS (SELECT n.node, 150000 + ((85 * COALESCE(c3.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, r AS pr FROM r3 ORDER BY node""".stripMargin,

    "q124_debounce" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus
        |           FROM events),
        |l AS (SELECT event_id, user_id, event_type, tus,
        |        LAG(tus) OVER (PARTITION BY user_id, event_type
        |          ORDER BY tus, event_id) AS prev
        |      FROM e)
        |SELECT event_id, user_id, event_type, tus FROM l
        |WHERE prev IS NULL OR tus - prev > 60000000
        |ORDER BY event_id""".stripMargin,

    "q125_gap_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |g AS (SELECT user_id,
        |        (tus - LAG(tus) OVER (PARTITION BY user_id
        |           ORDER BY tus, event_id)) // 1000 AS gap_ms
        |      FROM e),
        |gg AS (SELECT user_id, gap_ms FROM g WHERE gap_ms IS NOT NULL),
        |r AS (SELECT user_id, gap_ms,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_ms) AS rn,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n,
        |        MIN(gap_ms) OVER (PARTITION BY user_id) AS mn,
        |        MAX(gap_ms) OVER (PARTITION BY user_id) AS mx
        |      FROM gg)
        |SELECT user_id, n AS n_gaps, mn AS min_gap_ms,
        |       gap_ms AS med_gap_ms, mx AS max_gap_ms
        |FROM r WHERE rn = (n+1)//2
        |ORDER BY user_id""".stripMargin,

    "q122_mad" ->
      """WITH e AS (SELECT event_type,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS c FROM events),
        |r AS (SELECT event_type, c,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |med AS (SELECT event_type, c AS med, n FROM r WHERE rn = (n+1)//2),
        |dev AS (SELECT e.event_type, ABS(e.c - med.med) AS dv
        |        FROM e JOIN med ON e.event_type = med.event_type),
        |r2 AS (SELECT event_type, dv,
        |        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dv) AS rn,
        |        COUNT(*) OVER (PARTITION BY event_type) AS n2 FROM dev)
        |SELECT r2.event_type, med.n AS n, med.med AS med, r2.dv AS mad
        |FROM r2 JOIN med ON r2.event_type = med.event_type
        |WHERE r2.rn = (r2.n2+1)//2
        |ORDER BY r2.event_type""".stripMargin,

    "q128_profile_batched" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |       COUNT(*) - COUNT($c) AS n_nulls,
           |       COUNT(DISTINCT $c) AS n_distinct FROM lineitem""".stripMargin)
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },

    // closed form of the three-batch fold: a key survives unless its
    // LAST-effective op was a delete — %3 keys die in batch 2, only the
    // %9 subset revives in batch 3; price reflects the latest surviving
    // upsert (batch 3's %9 beats batch 2's %7 beats batch 1's %5)
    "q129_cdc_compaction" ->
      """WITH base AS (SELECT o_orderkey AS k,
        |                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
        |                o_orderstatus AS status FROM orders)
        |SELECT k,
        |       CASE WHEN k % 9 = 0 THEN price_c + 99
        |            WHEN k % 7 = 0 THEN price_c + 777
        |            WHEN k % 5 = 0 THEN price_c + 10000
        |            ELSE price_c END AS price_c,
        |       status
        |FROM base
        |WHERE k % 3 != 0 OR k % 9 = 0
        |ORDER BY k""".stripMargin,

    // two synchronous plurality-vote rounds as chained CTEs; the argmax
    // is ROW_NUMBER ordered (count DESC, label ASC) — the same
    // deterministic tiebreak the Spark min_by struct encodes
    "q130_label_prop" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e0 AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |e AS (SELECT a AS s, b AS d FROM e0
        |      UNION ALL SELECT b AS s, a AS d FROM e0),
        |l0 AS (SELECT DISTINCT s AS node, s AS lbl FROM e),
        |v1 AS (SELECT e.d AS node, l.lbl AS lbl, COUNT(*) AS c
        |       FROM e JOIN l0 l ON e.s = l.node GROUP BY e.d, l.lbl),
        |l1 AS (SELECT node, lbl FROM (
        |         SELECT node, lbl, ROW_NUMBER() OVER (
        |           PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM v1)
        |       WHERE rn = 1),
        |v2 AS (SELECT e.d AS node, l.lbl AS lbl, COUNT(*) AS c
        |       FROM e JOIN l1 l ON e.s = l.node GROUP BY e.d, l.lbl),
        |l2 AS (SELECT node, lbl FROM (
        |         SELECT node, lbl, ROW_NUMBER() OVER (
        |           PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM v2)
        |       WHERE rn = 1)
        |SELECT node, lbl AS label FROM l2 ORDER BY node""".stripMargin,

    "q131_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             epoch_us(ts) // 86400000000 AS day FROM events),
        |g AS (SELECT user_id, day,
        |        day - ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY day) AS grp FROM d)
        |SELECT user_id, MIN(day) AS streak_start_day,
        |       MAX(day) AS streak_end_day, COUNT(*) AS n_days
        |FROM g GROUP BY user_id, grp
        |ORDER BY user_id, streak_start_day""".stripMargin,

    "q132_sssp" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e0 AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |ew AS (SELECT a, b, 1 + (a + b) % 5 AS w FROM e0),
        |e AS (SELECT a AS s, b AS d, w FROM ew
        |      UNION ALL SELECT b AS s, a AS d, w FROM ew),
        |d0 AS (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS dist FROM e
        |       WHERE s % 97 = 0),
        |d1 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d0
        |         UNION ALL SELECT e.d AS node, d0.dist + e.w AS dist
        |         FROM e JOIN d0 ON e.s = d0.node) t GROUP BY node),
        |d2 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d1
        |         UNION ALL SELECT e.d AS node, d1.dist + e.w AS dist
        |         FROM e JOIN d1 ON e.s = d1.node) t GROUP BY node),
        |d3 AS (SELECT node, MIN(dist) AS dist FROM (
        |         SELECT node, dist FROM d2
        |         UNION ALL SELECT e.d AS node, d2.dist + e.w AS dist
        |         FROM e JOIN d2 ON e.s = d2.node) t GROUP BY node)
        |SELECT node, dist FROM d3 ORDER BY node""".stripMargin,

    "q133_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |pr AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |deg AS (SELECT n, COUNT(*) AS degree FROM (SELECT a AS n FROM pr
        |          UNION ALL SELECT b AS n FROM pr) t GROUP BY n),
        |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |        FROM pr e1 JOIN pr e2 ON e2.a = e1.a AND e2.b > e1.b
        |        JOIN pr e3 ON e3.a = e1.b AND e3.b = e2.b),
        |tn AS (SELECT n, COUNT(*) AS n_triangles FROM (
        |         SELECT a AS n FROM tri UNION ALL SELECT b AS n FROM tri
        |         UNION ALL SELECT c AS n FROM tri) t GROUP BY n)
        |SELECT deg.n, deg.degree,
        |       COALESCE(tn.n_triangles, 0) AS n_triangles,
        |       2 * COALESCE(tn.n_triangles, 0) AS coeff_num,
        |       deg.degree * (deg.degree - 1) AS coeff_den
        |FROM deg LEFT JOIN tn ON deg.n = tn.n
        |WHERE deg.degree >= 2
        |ORDER BY deg.n""".stripMargin,

    "q134_percent_ranks" ->
      """WITH c AS (SELECT event_type,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS c,
        |             COUNT(*) AS cnt
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, c, cnt,
        |       CAST(COALESCE(SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rank_m1,
        |       CAST(SUM(cnt) OVER (PARTITION BY event_type) - 1 AS BIGINT) AS n_m1
        |FROM c ORDER BY event_type, c""".stripMargin,

    "q135_sliding_distinct" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |             epoch_us(ts) // 86400000000 AS day FROM events),
        |days AS (SELECT DISTINCT day FROM d)
        |SELECT days.day, COUNT(DISTINCT d.user_id) AS n_users
        |FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
        |GROUP BY days.day ORDER BY days.day""".stripMargin,

    "q136_rollup" ->
      s"""SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |       ELSE l_returnflag END AS rf,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |       ELSE l_linestatus END AS ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(${CENTS.format("l_extendedprice")}) AS BIGINT) AS sum_price_c
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q137_pivot" -> {
      val p = CENTS.format("l_extendedprice")
      s"""SELECT l_linestatus,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN $p END), 0) AS BIGINT) AS sum_a,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN $p END), 0) AS BIGINT) AS sum_n,
        |  CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN $p END), 0) AS BIGINT) AS sum_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
    },

    "q138_frequent_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
        |           FROM lineitem),
        |ic AS (SELECT i, COUNT(*) AS cnt FROM b GROUP BY i),
        |f AS (SELECT i, cnt FROM ic WHERE cnt >= 2),
        |fb AS (SELECT b.bk, b.i FROM b JOIN f ON b.i = f.i),
        |p AS (SELECT x.i AS item_a, y.i AS item_b, COUNT(*) AS pair_cnt
        |      FROM fb x JOIN fb y ON x.bk = y.bk AND x.i < y.i
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |nb AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM b)
        |SELECT p.item_a, p.item_b, p.pair_cnt,
        |       fa.cnt AS cnt_a, fbb.cnt AS cnt_b, nb.n_baskets,
        |       CAST(p.pair_cnt * nb.n_baskets AS BIGINT) AS lift_num,
        |       CAST(fa.cnt * fbb.cnt AS BIGINT) AS lift_den
        |FROM p JOIN f fa ON p.item_a = fa.i
        |       JOIN f fbb ON p.item_b = fbb.i, nb
        |ORDER BY item_a, item_b""".stripMargin,

    "q139_winsorize" -> {
      val c = CENTS.format("value")
      s"""WITH v AS (SELECT event_id, event_type, $c AS c FROM events),
        |cn AS (SELECT event_type, c, COUNT(*) AS cnt FROM v
        |       WHERE c IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, c, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        SUM(cnt) OVER (PARTITION BY event_type) AS n
        |      FROM cn),
        |thr AS (SELECT event_type,
        |          MIN(CASE WHEN cum - cnt <= (1 * n) // 20
        |                    AND (1 * n) // 20 < cum THEN c END) AS lo,
        |          MIN(CASE WHEN cum - cnt <= (19 * n) // 20
        |                    AND (19 * n) // 20 < cum THEN c END) AS hi
        |        FROM r GROUP BY event_type)
        |SELECT v.event_id, v.event_type, v.c,
        |       GREATEST(thr.lo, LEAST(thr.hi, v.c)) AS c_w
        |FROM v JOIN thr USING (event_type)
        |ORDER BY event_id""".stripMargin
    },

    "q140_expectations" ->
      """WITH nn AS (SELECT 'not_null' AS rule, 'o_custkey' AS col_name,
        |              COUNT(*) AS n_rows,
        |              SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_violations
        |            FROM orders),
        |un AS (SELECT 'unique', 'o_orderkey', COUNT(*),
        |         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders),
        |av AS (SELECT 'accepted_values', 'o_orderstatus', COUNT(*),
        |         SUM(CASE WHEN o_orderstatus IS NOT NULL
        |               AND o_orderstatus NOT IN ('F', 'O', 'P')
        |             THEN 1 ELSE 0 END) FROM orders),
        |rg AS (SELECT 'range', 'o_custkey', COUNT(*),
        |         SUM(CASE WHEN o_custkey IS NOT NULL
        |               AND (o_custkey < 1 OR o_custkey > 1000)
        |             THEN 1 ELSE 0 END) FROM orders)
        |SELECT rule, col_name, CAST(n_rows AS BIGINT) AS n_rows,
        |       CAST(n_violations AS BIGINT) AS n_violations,
        |       CAST(n_violations = 0 AS BIGINT) AS pass
        |FROM (SELECT * FROM nn UNION ALL SELECT * FROM un
        |      UNION ALL SELECT * FROM av UNION ALL SELECT * FROM rg)
        |ORDER BY rule, col_name""".stripMargin,

    "q141_agg_state_merge" -> {
      val v = CENTS.format("o_totalprice")
      s"""SELECT o_custkey, COUNT(v) AS n, CAST(SUM(v) AS BIGINT) AS sum_x,
        |       MIN(v) AS min_x, MAX(v) AS max_x
        |FROM (SELECT o_custkey, $v AS v FROM orders) t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    },

    "q143_orc_roundtrip" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus,
        |       ${CENTS.format("o_totalprice")} AS price_c
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q147_twap" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
        |g AS (SELECT user_id, v,
        |        (LEAD(tus) OVER (PARTITION BY user_id
        |           ORDER BY tus, event_id) - tus) // 1000 AS dt_ms
        |      FROM x)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |       CAST(SUM(v * dt_ms) AS BIGINT) AS twa_num,
        |       CAST(SUM(dt_ms) AS BIGINT) AS twa_den
        |FROM g WHERE dt_ms IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // exact fixed-point HITS: each round is pure 64-bit integer
    // arithmetic — gather-sum then max-rescale (`//` ≡ Spark `div` on the
    // non-negative values here) — replayed as chained CTEs with scalar
    // MAX subqueries standing in for the operator's O(1) driver scalars
    "q148_hits" ->
      """WITH e AS (SELECT DISTINCT 2*l_partkey AS s, 2*l_suppkey+1 AS d
        |           FROM lineitem),
        |n AS (SELECT s AS node FROM e UNION SELECT d AS node FROM e),
        |s0 AS (SELECT node, CAST(10000 AS BIGINT) AS h FROM n),
        |ca1 AS (SELECT e.d AS node, CAST(SUM(s0.h) AS BIGINT) AS raw
        |        FROM e JOIN s0 ON e.s = s0.node GROUP BY e.d),
        |a1 AS (SELECT n.node, CAST(COALESCE(
        |         (ca1.raw * 10000) // (SELECT MAX(raw) FROM ca1), 0) AS BIGINT) AS a
        |       FROM n LEFT JOIN ca1 ON n.node = ca1.node),
        |ch1 AS (SELECT e.s AS node, CAST(SUM(a1.a) AS BIGINT) AS raw
        |        FROM e JOIN a1 ON e.d = a1.node GROUP BY e.s),
        |h1 AS (SELECT n.node, CAST(COALESCE(
        |         (ch1.raw * 10000) // (SELECT MAX(raw) FROM ch1), 0) AS BIGINT) AS h
        |       FROM n LEFT JOIN ch1 ON n.node = ch1.node),
        |ca2 AS (SELECT e.d AS node, CAST(SUM(h1.h) AS BIGINT) AS raw
        |        FROM e JOIN h1 ON e.s = h1.node GROUP BY e.d),
        |a2 AS (SELECT n.node, CAST(COALESCE(
        |         (ca2.raw * 10000) // (SELECT MAX(raw) FROM ca2), 0) AS BIGINT) AS a
        |       FROM n LEFT JOIN ca2 ON n.node = ca2.node),
        |ch2 AS (SELECT e.s AS node, CAST(SUM(a2.a) AS BIGINT) AS raw
        |        FROM e JOIN a2 ON e.d = a2.node GROUP BY e.s),
        |h2 AS (SELECT n.node, CAST(COALESCE(
        |         (ch2.raw * 10000) // (SELECT MAX(raw) FROM ch2), 0) AS BIGINT) AS h
        |       FROM n LEFT JOIN ch2 ON n.node = ch2.node)
        |SELECT h2.node, h2.h AS hub, a2.a AS auth
        |FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY h2.node""".stripMargin,

    // RRF with integer-division points (`//` ≡ Spark `div` on the
    // positive ranks here) — the fused score replays exactly
    "q150_rrf_fusion" -> {
      val c = CENTS.format("value")
      s"""WITH ev AS (SELECT event_type, user_id, $c AS c FROM events),
        |agg AS (SELECT event_type, user_id, COUNT(*) AS n,
        |          CAST(SUM(c) AS BIGINT) AS spend
        |        FROM ev GROUP BY event_type, user_id),
        |u AS (SELECT event_type, user_id, ROW_NUMBER() OVER (
        |        PARTITION BY event_type ORDER BY n DESC, user_id) AS rank
        |      FROM agg
        |      UNION ALL
        |      SELECT event_type, user_id, ROW_NUMBER() OVER (
        |        PARTITION BY event_type ORDER BY spend DESC, user_id) AS rank
        |      FROM agg),
        |sc AS (SELECT event_type, user_id,
        |         CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_score
        |       FROM u GROUP BY event_type, user_id),
        |f AS (SELECT event_type, user_id, rrf_score, ROW_NUMBER() OVER (
        |        PARTITION BY event_type
        |        ORDER BY rrf_score DESC, user_id) AS fused_rank FROM sc)
        |SELECT event_type, user_id, rrf_score, fused_rank FROM f
        |WHERE fused_rank <= 10
        |ORDER BY event_type, fused_rank""".stripMargin
    },

    "q151_gini" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS c FROM events
        |           GROUP BY user_id, event_type),
        |g AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
        |        CAST(SUM(c*c) AS BIGINT) AS ss FROM c GROUP BY user_id)
        |SELECT user_id, n, n*n - ss AS gini_num, n*n AS gini_den
        |FROM g ORDER BY user_id""".stripMargin,

    // the EWMA fold is not associative (integer division per step), so
    // the oracle replays the SAME time-sorted fold with list_reduce —
    // `//` ≡ Spark `div` on the non-negative cents the operator enforces
    "q152_ewma" ->
      """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY tus DESC, event_id DESC) AS rn FROM x),
        |g AS (SELECT user_id, COUNT(*) AS n_obs,
        |        list(v ORDER BY tus, event_id) AS vs
        |      FROM r WHERE rn <= 32 GROUP BY user_id)
        |SELECT user_id, n_obs,
        |       CAST(list_reduce(vs, (acc, v) -> (3*v + 7*acc) // 10)
        |            AS BIGINT) AS ewma_c
        |FROM g ORDER BY user_id""".stripMargin,

    "q154_stream_topk" ->
      """SELECT event_type AS key, COUNT(*) AS cnt_lo, COUNT(*) AS cnt_hi
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY event_type ORDER BY key""".stripMargin,

    "q163_zero_floor" -> {
      val c = CENTS.format("o_totalprice")
      s"""WITH d AS (SELECT o_custkey, o_orderkey,
        |             CASE WHEN o_orderstatus = 'O' THEN $c
        |                  ELSE -$c END AS delta
        |           FROM orders),
        |s AS (SELECT o_custkey, o_orderkey, delta,
        |        CAST(SUM(delta) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS rs
        |      FROM d),
        |m AS (SELECT *, MIN(rs) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm
        |      FROM s)
        |SELECT o_custkey, o_orderkey, delta,
        |       CAST(rs - LEAST(rm, 0) AS BIGINT) AS balance
        |FROM m ORDER BY o_custkey, o_orderkey""".stripMargin
    },

    "q164_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |tch AS (SELECT user_id, event_id AS touch_id,
        |          event_type AS touch_type, tus AS tts
        |        FROM ev WHERE event_type IN ('click', 'view')),
        |cv AS (SELECT user_id, event_id AS conv_id, tus AS cts, cents
        |       FROM ev WHERE event_type = 'purchase'),
        |p AS (SELECT cv.user_id, cv.conv_id, tch.touch_id,
        |        tch.touch_type, cv.cents
        |      FROM cv JOIN tch ON cv.user_id = tch.user_id
        |       AND cv.cts - 3600000000 <= tch.tts AND tch.tts < cv.cts),
        |n AS (SELECT conv_id, COUNT(*) AS credit_den FROM p
        |      GROUP BY conv_id)
        |SELECT p.user_id, p.conv_id, p.touch_id, p.touch_type,
        |       p.cents AS credit_num, n.credit_den
        |FROM p JOIN n ON p.conv_id = n.conv_id
        |ORDER BY p.conv_id, p.touch_id""".stripMargin,

    "q165_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |d AS (SELECT user_id, event_type, cents,
        |        (tus - (tus % 86400000000)) // 86400000000 AS day FROM ev),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d
        |      GROUP BY user_id),
        |sz AS (SELECT cohort_day, COUNT(*) AS n_users FROM f
        |       GROUP BY cohort_day),
        |r AS (SELECT f.cohort_day, d.day - f.cohort_day AS age_days,
        |        CAST(SUM(d.cents) AS BIGINT) AS rev_c
        |      FROM d JOIN f ON d.user_id = f.user_id
        |      WHERE d.event_type = 'purchase'
        |      GROUP BY f.cohort_day, d.day - f.cohort_day)
        |SELECT r.cohort_day, r.age_days, sz.n_users, r.rev_c,
        |       CAST(SUM(r.rev_c) OVER (PARTITION BY r.cohort_day
        |         ORDER BY r.age_days
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS cum_rev_c
        |FROM r JOIN sz ON r.cohort_day = sz.cohort_day
        |ORDER BY r.cohort_day, r.age_days""".stripMargin,

    "q166_position_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |            FROM events),
        |tch AS (SELECT user_id, event_id AS touch_id,
        |          event_type AS touch_type, tus AS tts
        |        FROM ev WHERE event_type IN ('click', 'view')),
        |cv AS (SELECT user_id, event_id AS conv_id, tus AS cts, cents
        |       FROM ev WHERE event_type = 'purchase'),
        |p AS (SELECT cv.user_id, cv.conv_id, tch.touch_id,
        |        tch.touch_type, tch.tts, cv.cents
        |      FROM cv JOIN tch ON cv.user_id = tch.user_id
        |       AND cv.cts - 3600000000 <= tch.tts AND tch.tts < cv.cts),
        |r AS (SELECT p.*,
        |        ROW_NUMBER() OVER (PARTITION BY conv_id
        |          ORDER BY tts, touch_id) AS ra,
        |        ROW_NUMBER() OVER (PARTITION BY conv_id
        |          ORDER BY tts DESC, touch_id DESC) AS rd,
        |        COUNT(*) OVER (PARTITION BY conv_id) AS n
        |      FROM p)
        |SELECT user_id, conv_id, touch_id, touch_type,
        |       CASE WHEN n = 1 THEN 'only' WHEN n = 2 THEN 'half'
        |            WHEN ra = 1 THEN 'first' WHEN rd = 1 THEN 'last'
        |            ELSE 'middle' END AS position,
        |       CAST(CASE WHEN n = 1 THEN cents * 1000
        |            WHEN n = 2 THEN cents * 500
        |            WHEN ra = 1 OR rd = 1 THEN cents * 400
        |            ELSE cents * 200 END AS BIGINT) AS credit_num,
        |       CAST(CASE WHEN n <= 2 OR ra = 1 OR rd = 1 THEN 1000
        |            ELSE 1000 * (n - 2) END AS BIGINT) AS credit_den
        |FROM r ORDER BY conv_id, touch_id""".stripMargin,

    "q167_minmax_scale" -> {
      val c = CENTS.format("o_totalprice")
      s"""WITH d AS (SELECT o_orderkey, o_orderpriority, $c AS c
        |           FROM orders),
        |s AS (SELECT o_orderpriority, MIN(c) AS mn, MAX(c) AS mx FROM d
        |      GROUP BY o_orderpriority)
        |SELECT d.o_orderkey, d.o_orderpriority, d.c,
        |       CAST(CASE WHEN s.mx = s.mn THEN 0
        |            ELSE (d.c - s.mn) * 1000000 // (s.mx - s.mn) END
        |            AS BIGINT) AS c_mm
        |FROM d JOIN s USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin
    },

    "q168_equidepth" -> {
      val c = CENTS.format("value")
      s"""WITH d AS (SELECT $c AS v FROM events WHERE value IS NOT NULL),
        |c AS (SELECT v, COUNT(*) AS cnt FROM d GROUP BY v),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
        |r AS (SELECT v, cnt,
        |        COALESCE(SUM(cnt) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS below
        |      FROM c)
        |SELECT CAST(r.below * 8 // t.n AS BIGINT) AS bucket,
        |       MIN(r.v) AS lo, MAX(r.v) AS hi,
        |       CAST(SUM(r.cnt) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM r, t GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q169_corr_matrix" -> {
      val cols = Seq("qty_c" -> CENTS.format("l_quantity"),
        "price_d" -> "CAST(FLOOR(l_extendedprice) AS BIGINT)",
        "disc_c" -> CENTS.format("l_discount"),
        "tax_c" -> CENTS.format("l_tax"))
      val defs = cols.map { case (a, e) => s"$e AS $a" }.mkString(", ")
      val pairSqls = for {
        i <- cols.indices; j <- (i + 1) until cols.size
      } yield {
        val (x, y) = (cols(i)._1, cols(j)._1)
        s"""SELECT '$x' AS x_col, '$y' AS y_col,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(COALESCE(SUM($x), 0) AS BIGINT) AS sum_x,
          |  CAST(COALESCE(SUM($y), 0) AS BIGINT) AS sum_y,
          |  CAST(COALESCE(SUM($x * $x), 0) AS BIGINT) AS sum_xx,
          |  CAST(COALESCE(SUM($y * $y), 0) AS BIGINT) AS sum_yy,
          |  CAST(COALESCE(SUM($x * $y), 0) AS BIGINT) AS sum_xy
          |FROM d WHERE $x IS NOT NULL AND $y IS NOT NULL""".stripMargin
      }
      s"""WITH d AS (SELECT $defs FROM lineitem)
        |SELECT * FROM (${pairSqls.mkString("\n UNION ALL\n")})
        |ORDER BY x_col, y_col""".stripMargin
    },
  )
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Gate-registry shard 5 (q170–q228): each gate's Spark lambda and
  * its DuckDB oracle SQL side by side — pure relocation of the
  * [[SparkEntry]] registry (r15 verdict #6), no behavior change.
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] assemble the shards.
  */
private[graft] object Gates5 {
  import GateSupport._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ── melt / unpivot: the wide lineitem measures to long
    // (id, var, val) rows — native Expand, no shuffle, NULLs kept ────────
    "q170_melt" -> ((s, dir) =>
      graft.operators.TableOps.melt(
        s.read.parquet(t(dir, "lineitem"))
          .select(col("l_orderkey"), col("l_linenumber"),
            cents(col("l_quantity")).as("qty_c"),
            cents(col("l_extendedprice")).as("price_c"),
            cents(col("l_discount")).as("disc_c"),
            cents(col("l_tax")).as("tax_c")),
        idCols = Seq("l_orderkey", "l_linenumber"),
        valueCols = Seq("qty_c", "price_c", "disc_c", "tax_c"))
        .orderBy("l_orderkey", "l_linenumber", "var")),

    // ── MAD-rule robust outliers: event values beyond 3·MAD of their
    // type's exact median — the flag a single wild value can't corrupt ───
    "q159_robust_outliers" -> ((s, dir) =>
      graft.operators.TableOps.robustOutliers(
        s.read.parquet(t(dir, "events"))
          .select(col("event_type"), cents(col("value")).as("c")),
        "event_type", "c", mult = 3L)),

    // ── referential integrity both ways: lineitem→orders holds by
    // construction; events users→customers is the orphan-heavy case ──────
    "q160_ref_integrity" -> ((s, dir) =>
      graft.operators.Quality.referential(
          s.read.parquet(t(dir, "lineitem")), "l_orderkey",
          s.read.parquet(t(dir, "orders")), "o_orderkey")
        .unionByName(graft.operators.Quality.referential(
          s.read.parquet(t(dir, "events")), "user_id",
          s.read.parquet(t(dir, "customer")), "c_custkey"))
        .orderBy("col_name")),

    // ── missing o_orderkey ranges: the neighbor pair via the TeraSort
    // sliding machinery (window-2 Min), never a partitionless window ─────
    "q161_missing_ranges" -> ((s, dir) =>
      graft.operators.TableOps.missingRanges(
        s.read.parquet(t(dir, "orders"))
          .filter(col("o_orderstatus") === "F"), "o_orderkey")),

    // ── ancestor closure of the decimal part hierarchy (parent = key
    // div 10), 4 levels: the dimension-flattening closure table ──────────
    "q162_ancestors" -> ((s, dir) => {
      val pc = s.read.parquet(t(dir, "part"))
        .filter(col("p_partkey") >= 10)
        .select(col("p_partkey").as("c"), expr("p_partkey div 10").as("p"))
      graft.graph.Hierarchy.ancestors(pc, "c", "p", maxDepth = 4)
    }),

    // ── 3-truss of the co-purchase graph (2 peel rounds): every
    // surviving edge sits in ≥ 1 triangle — edge cohesion one notch
    // stronger than q121's k-core; support recounted per peel ───────────
    "q157_ktruss" -> ((s, dir) => {
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
      graft.graph.Truss.kTruss(pairs, "pa", "pb", k = 3, maxPeels = 2)
    }),

    // ── functional-dependency check over orders: key discovery with the
    // violation DEGREE (max fan-out), one pruned two-level agg per pair ──
    "q158_fd_check" -> ((s, dir) =>
      graft.operators.TableOps.functionalDeps(
        s.read.parquet(t(dir, "orders")),
        Seq(("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus"),
          ("o_orderkey", "o_orderstatus")))),

    // ── per-seed harmonic centrality (every 100th supplier, 3 hops) over
    // the part↔supplier graph: Σ L/d as an exact fraction with
    // L = lcm(1..3) = 6 divisible by every hop count — no truncation ─────
    "q155_harmonic" -> ((s, dir) => {
      // spread the single-split scan before the edge distinct
      // (r15 optimization round; no-op at scale)
      val li = graft.text.TextOps.spreadScan(
        s.read.parquet(t(dir, "lineitem")), "l_orderkey")
      val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("s"),
        (col("l_suppkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val seeds = s.read.parquet(t(dir, "supplier"))
        .filter(pmod(col("s_suppkey"), lit(100)) === 1)
        .select((col("s_suppkey") * 2 + 1).cast(LongType).as("node"))
      graft.graph.Centrality.harmonicCentrality(
        e0, "s", "d", seeds, "node", maxHops = 3)
    }),

    // ── snapshot diff → APPLYABLE changelog: the minimal U/D batch that
    // transforms the base orders snapshot into a simulated next-day
    // snapshot (deletes, reprices, inserts); round-trip law spec-pinned ──
    "q156_make_changelog" -> ((s, dir) => {
      val base = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_c"))
      val target = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .withColumn("price_c", when(pmod(col("o_orderkey"), lit(5)) === 0,
          col("price_c") + 100L).otherwise(col("price_c")))
        .unionByName(base.filter(pmod(col("o_orderkey"), lit(11)) === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_custkey"), col("price_c")))
      graft.operators.TableOps.makeChangelog(base, target, "o_orderkey", seq = 1L)
    }),

    // ── personalized PageRank from the nation-1 suppliers over the
    // bidirectional part↔supplier graph: restart mass on seeds only, so
    // ranks measure relevance NEAR the seed set; exact ppm arithmetic ────
    "q153_ppr" -> ((s, dir) => {
      // spread the single-split scan before the edge distinct
      // (r15 optimization round; no-op at scale)
      val li = graft.text.TextOps.spreadScan(
        s.read.parquet(t(dir, "lineitem")), "l_orderkey")
      val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("s"),
        (col("l_suppkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      val seeds = s.read.parquet(t(dir, "supplier"))
        .filter(col("s_nationkey") === 1)
        .select((col("s_suppkey") * 2 + 1).cast(LongType).as("node"))
      graft.graph.PageRank.personalizedPageRank(
          edges, "s", "d", seeds, "node", iterations = 3)
        .select(col("node"), col("rank").as("ppr"))
    }),

    // ── link prediction over the co-purchase graph: common-neighbor
    // count + neighborhood Jaccard for NON-adjacent pairs, defined over
    // the capped-connector neighborhoods (maxDegree hub guard — per-
    // center wedge work is bounded at maxDegree² regardless of skew) ─────
    "q149_link_predict" -> ((s, dir) => {
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
      graft.graph.LinkPredict.commonNeighbors(pairs, "pa", "pb",
        maxDegree = 20, minCommon = 2L)
    }),

    // ── modularity of the LPA communities over the co-purchase graph:
    // exact per-community fractions (4·m·e_c − d_c²) / 4m² — the quality
    // score beside q130's labels and q133's density ──────────────────────
    "q146_modularity" -> ((s, dir) => {
      // spread the single-split scan before the distinct + self-join
      // (r15 optimization round; no-op at scale — see TextOps.spreadScan)
      val op = graft.text.TextOps.spreadScan(
          s.read.parquet(t(dir, "lineitem"))
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), "o")
        .distinct()
      // the pair-graph build feeds both LPA and the modularity joins —
      // no cross-branch CSE in Spark, so materialize it once
      val pairs = graft.operators.Checkpoints.checkpoint(
        op.as("x").join(op.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("pa"), col("y.p").as("pb"))
          .agg(count(lit(1)).as("m"))
          .filter(col("m") >= 2).select(col("pa"), col("pb")))
      val labels = graft.graph.LabelProp.labelPropagation(pairs, "pa", "pb", rounds = 2)
      graft.graph.Modularity.perCommunity(pairs, "pa", "pb", labels)
    }),

    // ── Pareto frontier over per-customer (order count, spend): the
    // staircase prefix-MAX scan replaces the oracle's O(n²) dominance
    // anti-join — O(distinct x) exchange, TeraSort two-pass machinery ────
    "q145_skyline" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "orders"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("spend_c"))
      graft.operators.Skyline.pareto2d(c, "n_orders", "spend_c")
        .orderBy("o_custkey")
    }),

    // ── incremental PageRank warm start: 2 warm rounds seeded by a
    // 2-round cold run ≡ the oracle's 4-round CTE replay — the update is
    // a pure function of the rank table, so continuing from round-k
    // state IS rounds k+1..k+j; with the exact early stop this makes
    // re-ranking after a small edge delta one-or-few rounds, not a full
    // cold trajectory ─────────────────────────────────────────────────────
    "q213_pagerank_warm" -> ((s, dir) => {
      val cust = s.read.parquet(t(dir, "customer"))
      val e0 = cust.select((col("c_custkey") * 2).cast(LongType).as("s"),
        (col("c_nationkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      val cold = graft.graph.PageRank.pageRank(edges, "s", "d", iterations = 2)
      graft.graph.PageRank.pageRank(edges, "s", "d", iterations = 2,
          prior = Some(cold))
        .select(col("node"), col("rank").as("pr"))
    }),

    // ── 3-D Pareto frontier over per-customer (order count, spend,
    // recency): x-desc TeraSort + carried 2-D (y,z) frontier — two jobs
    // over one shuffle, never the oracle's O(n²) dominance anti-join ─────
    "q212_skyline3d" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "orders"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("spend_c"),
          // NTZ → TimestampType under the session's UTC zone, the
          // EventOps.tsMicros parity convention with DuckDB epoch_us
          max(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            ).as("recency_d"))
      graft.operators.Skyline.pareto3d(c, "n_orders", "spend_c", "recency_d")
        .orderBy("o_custkey")
    }),

    // ── co-located bucketed join: both sides written hash-bucketed on the
    // order key (8 buckets), then joined + aggregated — the write-once-
    // join-often layout; zero join exchanges spec-pinned in BucketedSpec ─
    "q144_bucketed_join" -> ((s, dir) => {
      graft.sources.Bucketed.saveBucketed(
        s.read.parquet(t(dir, "orders")).select("o_orderkey", "o_orderstatus"),
        "graft_gate_bord", "o_orderkey", nBuckets = 8)
      graft.sources.Bucketed.saveBucketed(
        s.read.parquet(t(dir, "lineitem"))
          .select(col("l_orderkey"), cents(col("l_extendedprice")).as("p")),
        "graft_gate_bli", "l_orderkey", nBuckets = 8)
      graft.sources.Bucketed.table(s, "graft_gate_bli")
        .join(graft.sources.Bucketed.table(s, "graft_gate_bord"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("p").as("sum_p"))
        .orderBy("o_orderstatus")
    }),

    // ── incremental materialized aggregate: the click slice replayed in
    // 3 micro-batches through the foreachBatch merge-state maintainer —
    // the fold across batch boundaries must equal the direct GROUP BY
    // (a slice for the q97 reason: the replay harness is driver-fed) ─────
    "q142_stream_agg_state" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.aggStateReplay(evts, nChunks = 3)
        .select(col("userId").as("user_id"), col("n"), col("sum_x"),
          col("min_x"), col("max_x"))
        .orderBy("user_id")
    }),

    // ── the streaming dedup state path (dropDuplicatesWithinWatermark):
    // the click slice unioned with itself — every id a duplicate — must
    // come back exactly once with its original row (a slice for the same
    // reason as q97: the replay harness is driver-fed, so corpus volume
    // is bench weight, not extra state-path evidence) ────────────────────
    "q98_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming
        .dedupReplay(evts.union(evts), watermarkSec = 3600)
        .toDF()
        .select(col("eventId").as("event_id"), col("userId").as("user_id"),
          col("tsUs").as("tus"), col("valueCents").as("cents"))
        .orderBy("event_id")
    }),

    // ── incremental PageRank over an EDGE DELTA — the scenario the warm
    // start exists for (q213 pins the k+j contract on identical edges):
    // cold-rank E (customer↔nation bipartite), then re-rank E ∪ ΔE (ΔE
    // links the 25 nation nodes to 5 new region hubs) seeded with the
    // cold output. Nodes new in ΔE start at scale, touched ranks shift,
    // and the exact early stop makes post-delta maintenance one-or-few
    // rounds at a real fixed point (spec-pinned in PageRankSpec); the
    // oracle replays cold(2 rounds on E) + warm(3 rounds on E ∪ ΔE)
    // cell-for-cell ───────────────────────────────────────────────────────
    "q214_pagerank_delta" -> ((s, dir) => {
      val cust = s.read.parquet(t(dir, "customer"))
      val nat = s.read.parquet(t(dir, "nation"))
      val e0 = cust.select((col("c_custkey") * 2).cast(LongType).as("s"),
        (col("c_nationkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      val cold = graft.graph.PageRank.pageRank(edges, "s", "d", iterations = 2)
      val d0 = nat.select((col("n_nationkey") * 2 + 1).cast(LongType).as("s"),
        (col("n_regionkey") + 9000000L).cast(LongType).as("d")).distinct()
      val delta = edges.union(d0)
        .union(d0.select(col("d").as("s"), col("s").as("d")))
      graft.graph.PageRank.pageRank(delta, "s", "d", iterations = 3,
          prior = Some(cold))
        .select(col("node"), col("rank").as("pr"))
    }),

    // ── unknown-domain quantile sketch (decimal-log binning): the
    // [lo,hi)-free counterpart of q210 — per-flag sketches over an
    // UNBOUNDED cents column, one map-side-combined count per (group,
    // bucket), ≤ ~1.7k buckets per group over the whole Long range;
    // quantile read = lower edge of the rank bucket (exact integer
    // binning, never a floating log) ─────────────────────────────────────
    "q215_logsketch_quantiles" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag").as("g"),
          cents(col("l_extendedprice")).as("v"))
      graft.operators.LogQuantileSketch.summary(li, Seq("g"), "v",
        digits = 2, qs = Seq((1, 2), (9, 10)))
    }),

    // ── the log sketch's cube contract on real data: fine sketches per
    // (returnflag, linestatus) rolled up to returnflag must equal the
    // direct coarse sketch — the oracle computes the DIRECT side, so the
    // hash match IS the merge-contract proof at data scale ───────────────
    "q216_logsketch_rollup" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag").as("g"), col("l_linestatus").as("sub"),
          cents(col("l_extendedprice")).as("v"))
      val fine = graft.operators.LogQuantileSketch.sketch(li, Seq("g", "sub"), "v")
      val coarse = graft.operators.LogQuantileSketch.rollup(fine, Seq("g"))
      graft.operators.LogQuantileSketch.quantiles(coarse, Seq("g"),
        Seq((1, 4), (3, 4)))
    }),

    // ── WEIGHTED quantile sketch: revenue-weighted order-size quantiles
    // per flag ("at what quantity does half the revenue sit") — slots
    // accumulate SUM(weight) instead of COUNT in the same exact
    // vector-add monoid; width-1 integer domain → exact, so the oracle
    // replays it as a weight-cumulative window over the raw values ──────
    "q217_qsketch_weighted" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag"), col("l_quantity").cast(LongType).as("v"),
          cents(col("l_extendedprice")).as("w"))
      graft.operators.QuantileSketch.summary(li, Seq("l_returnflag"), "v",
        lo = 1L, hi = 51L, bins = 50, qs = Seq((1, 2), (9, 10)),
        weightCol = Some("w"))
    }),

    // ── weighted UNKNOWN-domain sketch: quantity-weighted price
    // quantiles per flag over an undeclared cents column — the log
    // sketch's bucket rows accumulate SUM(weight); the string-arithmetic
    // oracle replays binning AND weighting ──────────────────────────────
    "q218_logsketch_weighted" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag").as("g"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast(LongType).as("w"))
      graft.operators.LogQuantileSketch.summary(li, Seq("g"), "v",
        digits = 2, qs = Seq((1, 2), (9, 10)), weightCol = Some("w"))
    }),

    // ── streaming quantile-sketch maintainer: the click slice replayed
    // in 3 micro-batches through the per-user sketch fold — exact
    // vector-add merge means the final snapshot IS the batch sketch
    // (any chunking), so the oracle is the plain per-user binned
    // cumulative window. The maintainer state is O(users · bins+2)
    // regardless of stream length ───────────────────────────────────────
    "q219_stream_qsketch" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.QuantileSketch
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      val snap = graft.streaming.EventStreaming.sketchReplay(evts,
        nChunks = 3, lo = 0L, hi = 50000L, bins = 100)
      snap.select(col("userId").as("user_id"),
          QuantileSketch.total(col("sketch")).as("n"),
          QuantileSketch.quantileLower(col("sketch"), 1, 2, 0L, 50000L, 100)
            .as("p50"),
          QuantileSketch.quantileLower(col("sketch"), 9, 10, 0L, 50000L, 100)
            .as("p90"))
        .orderBy("user_id")
    }),

    // ── SIGNED unknown-domain sketch (r14): price-delta quantiles per
    // flag over a column that crosses zero — negatives key the negated
    // magnitude-bucket CEILING (still the bucket's numeric lower edge),
    // so binning stays monotone across the signed line and the same
    // bounded-bucket quantile read works unchanged; the oracle replays
    // the signed binning with string arithmetic ─────────────────────────
    "q220_logsketch_signed" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_returnflag").as("g"),
          (cents(col("l_extendedprice")) - lit(5000000L)).as("v"))
      graft.operators.LogQuantileSketch.summary(li, Seq("g"), "v",
        digits = 2, qs = Seq((1, 10), (1, 2), (9, 10)))
    }),

    // ── HITS warm start on a REAL edge delta (r14, the q214 contract
    // ported to the second fixed-point loop): score the part→supplier
    // graph cold, extend it with supplier→new-hub edges, re-score the
    // delta'd graph seeded with the cold scores. Each round is a pure
    // function of the score table, so the warm rounds replay as cold
    // rounds k+1..k+j — which the chained-CTE oracle proves
    // cell-for-cell ──────────────────────────────────────────────────────
    "q221_hits_delta" -> ((s, dir) => {
      // spread the single-split scan before the edge distinct
      // (r15 optimization round; no-op at scale)
      val li = graft.text.TextOps.spreadScan(
        s.read.parquet(t(dir, "lineitem")), "l_orderkey")
      val nat = s.read.parquet(t(dir, "nation"))
      val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("s"),
        (col("l_suppkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val cold = graft.graph.Hits.hits(e0, "s", "d", iterations = 1)
      val d0 = nat.select((col("n_nationkey") * 2 + 1).cast(LongType).as("s"),
        (col("n_regionkey") + 9000000L).cast(LongType).as("d")).distinct()
      graft.graph.Hits.hits(e0.union(d0), "s", "d", iterations = 2,
        prior = Some(cold))
    }),

    // ── LPA warm start on a REAL edge delta (r14, the q214/q221 contract
    // ported to the third fixed-point loop): label the part↔supplier
    // bipartite graph cold, attach region hubs to the supplier side,
    // re-label the delta'd graph seeded with the cold labels. Each
    // synchronous round is a pure function of the label table, so the
    // warm rounds replay as cold rounds k+1..k+j — which the chained-CTE
    // oracle proves cell-for-cell ────────────────────────────────────────
    "q222_lpa_delta" -> ((s, dir) => {
      // spread the single-split scan before the edge distinct
      // (r15 optimization round; no-op at scale)
      val li = graft.text.TextOps.spreadScan(
        s.read.parquet(t(dir, "lineitem")), "l_orderkey")
      val nat = s.read.parquet(t(dir, "nation"))
      val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("a"),
        (col("l_suppkey") * 2 + 1).cast(LongType).as("b")).distinct()
      val cold = graft.graph.LabelProp.labelPropagation(e0, "a", "b",
        rounds = 1)
      val d0 = nat.select((col("n_nationkey") * 2 + 1).cast(LongType).as("a"),
        (col("n_regionkey") + 9000000L).cast(LongType).as("b")).distinct()
      graft.graph.LabelProp.labelPropagation(e0.union(d0), "a", "b",
        rounds = 2, prior = Some(cold))
    }),

    // ── portable distinct sketch (r14): HLL registers from md5 hex
    // arithmetic, stored as a plain BIGINT array ANY engine can read and
    // merge with element-wise MAX — unlike the opaque-bytes built-in
    // (`hll_sketch_agg`, SketchRollupSpec), the STATE itself is
    // oracle-checkable: DuckDB replays every register cell-for-cell.
    // One map-side-combined agg of 256 conditional MAXes; the exchange
    // per group is one fixed-width vector, never user ids ───────────────
    "q223_distinct_sketch" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      graft.operators.DistinctSketch.registers(ev, Seq("event_type"), "user_id")
    }),

    // ── the distinct-sketch cube contract: per-type register vectors
    // ROLL UP (element-wise max, never the raw rows) to the same global
    // registers a direct sketch computes — the oracle takes the direct
    // path, the gate the stored-cube path, and they must agree exactly ──
    "q224_distinct_rollup" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val fine = graft.operators.DistinctSketch.sketch(
        ev, Seq("event_type"), "user_id")
      graft.operators.DistinctSketch.rollup(fine, "sketch", 2, Nil)
        .select(posexplode(col("sketch")))
        .filter(col("col") > 0L)
        .select(col("pos").cast(LongType).as("bucket"), col("col").as("r"))
        .orderBy("bucket")
    }),

    // ── streaming distinct maintainer (r14): per-user DISTINCT ACTIVE
    // DAYS as a register-max fold over micro-batches — idempotent, so
    // at-least-once re-delivery needs no pre-dedup; the final snapshot
    // must equal the batch registers the DuckDB oracle computes directly
    // (a slice for the q97 reason: the replay harness is driver-fed) ─────
    "q225_stream_distinct" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      // the registers read: the maintainer's sparse state IS the gate's
      // output shape — no dense materialization only to re-sparsify (r15)
      graft.streaming.EventStreaming.distinctReplay(evts, nChunks = 3,
          registers = true)
        .select(col("userId").as("user_id"),
          col("slot").as("bucket"), col("r"))
        .orderBy("user_id", "bucket")
    }),

    // ── Z-order layout (r14): bit-interleave (customer, order day) so
    // contiguous z-slices are tight rectangles in value space — the
    // write-layout that lets multi-column box predicates prune files.
    // The gate pins the interleave arithmetic; the oracle replays the
    // identical shift/mask sum (Layout.zValueSql) ────────────────────────
    "q226_zorder" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"), col("o_custkey").as("x"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("y"))
      c.select(col("o_orderkey"),
          graft.operators.Layout.zValue(Seq(col("x"), col("y")), bits = 21)
            .as("zval"))
        .orderBy("o_orderkey")
    }),

    // ── incremental near-dedup (r14): dedup a NEW document batch against
    // the STORED MinHash signatures of the existing corpus — corpus text
    // never re-read, corpus×corpus pairs never re-examined; a delta doc
    // is flagged iff it shares an LSH band AND its signature agrees on
    // ≥ 3/4 of positions with a corpus doc or an earlier delta doc
    // (earliest id wins). The oracle replays bands + agreement directly ──
    "q227_dedup_delta" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      val corpusSigs = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 3 =!= 0), 16)
      val deltaSigs = Dedup.minhashSignatures(
        docs.filter(col("doc_id") % 3 === 0), 16)
      Dedup.dedupDelta(corpusSigs, deltaSigs, numHashes = 16,
        bands = 8, rowsPerBand = 2, num = 3, den = 4)
    }),

    // ── portable count-min sketch (r14): per-value FREQUENCY counters
    // from md5 hex slices, stored as a plain BIGINT array ANY engine can
    // read and merge with element-wise ADD — the frequency complement of
    // q223's distinct sketch. Unlike `count_min_sketch_agg`'s opaque
    // bytes, the counter STATE is oracle-checkable: DuckDB replays every
    // cell. One map-side-combined agg of 512 conditional sums; the
    // exchange per group is one fixed-width vector, never user ids ──────
    "q228_cms_registers" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      graft.operators.CountMinSketch.registers(ev, Seq("event_type"), "user_id")
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    "q170_melt" -> {
      val cols = Seq("qty_c" -> "l_quantity", "price_c" -> "l_extendedprice",
        "disc_c" -> "l_discount", "tax_c" -> "l_tax")
      val defs = cols.map { case (a, src) =>
        s"${CENTS.format(src)} AS $a"
      }.mkString(", ")
      val arms = cols.map { case (a, _) =>
        s"""SELECT l_orderkey, l_linenumber, '$a' AS var, $a AS val FROM d"""
      }
      s"""WITH d AS (SELECT l_orderkey, l_linenumber, $defs FROM lineitem)
        |${arms.mkString("\n UNION ALL\n")}
        |ORDER BY l_orderkey, l_linenumber, var""".stripMargin
    },

    // q122's exact lower-median chain extended with the flag join
    "q159_robust_outliers" ->
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
        |        COUNT(*) OVER (PARTITION BY event_type) AS n2 FROM dev),
        |mad AS (SELECT event_type, dv AS mad FROM r2 WHERE rn = (n2+1)//2),
        |st AS (SELECT med.event_type, med.med, mad.mad
        |       FROM med JOIN mad ON med.event_type = mad.event_type)
        |SELECT e.event_type, e.c, st.med, st.mad, ABS(e.c - st.med) AS dev
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE ABS(e.c - st.med) > 3 * st.mad
        |ORDER BY e.event_type, e.c""".stripMargin,

    "q160_ref_integrity" ->
      """SELECT * FROM (
        |  SELECT 'relationship' AS rule, 'l_orderkey' AS col_name,
        |         COUNT(*) AS n_rows,
        |         CAST(SUM(CASE WHEN l.l_orderkey IS NOT NULL
        |                        AND o.o_orderkey IS NULL
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |         SUM(CASE WHEN l.l_orderkey IS NOT NULL
        |                        AND o.o_orderkey IS NULL
        |                  THEN 1 ELSE 0 END) = 0 AS pass
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey FROM orders
        |     WHERE o_orderkey IS NOT NULL) o
        |    ON l.l_orderkey = o.o_orderkey
        |  UNION ALL
        |  SELECT 'relationship', 'user_id', COUNT(*),
        |         CAST(SUM(CASE WHEN e.user_id IS NOT NULL
        |                        AND c.c_custkey IS NULL
        |                  THEN 1 ELSE 0 END) AS BIGINT),
        |         SUM(CASE WHEN e.user_id IS NOT NULL
        |                        AND c.c_custkey IS NULL
        |                  THEN 1 ELSE 0 END) = 0
        |  FROM events e LEFT JOIN
        |    (SELECT DISTINCT c_custkey FROM customer
        |     WHERE c_custkey IS NOT NULL) c
        |    ON e.user_id = c.c_custkey) t
        |ORDER BY col_name""".stripMargin,

    "q161_missing_ranges" ->
      """WITH ids AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS id
        |             FROM orders WHERE o_orderkey IS NOT NULL
        |               AND o_orderstatus = 'F'),
        |l AS (SELECT id, LAG(id) OVER (ORDER BY id) AS prev FROM ids)
        |SELECT prev + 1 AS gap_start, id - 1 AS gap_end,
        |       id - prev - 1 AS gap_len
        |FROM l WHERE prev IS NOT NULL AND id - prev > 1
        |ORDER BY gap_start""".stripMargin,

    // the decimal hierarchy is a tree (anc strictly shrinks), so plain
    // chained joins replay the operator's min-depth closure exactly
    "q162_ancestors" ->
      """WITH pc AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS c,
        |              CAST(p_partkey // 10 AS BIGINT) AS p
        |            FROM part WHERE p_partkey >= 10),
        |l1 AS (SELECT c AS node, p AS anc, CAST(1 AS BIGINT) AS depth FROM pc),
        |l2 AS (SELECT l1.node, pc.p AS anc, CAST(2 AS BIGINT) AS depth
        |       FROM l1 JOIN pc ON l1.anc = pc.c),
        |l3 AS (SELECT l2.node, pc.p AS anc, CAST(3 AS BIGINT) AS depth
        |       FROM l2 JOIN pc ON l2.anc = pc.c),
        |l4 AS (SELECT l3.node, pc.p AS anc, CAST(4 AS BIGINT) AS depth
        |       FROM l3 JOIN pc ON l3.anc = pc.c)
        |SELECT node, anc, depth FROM (
        |  SELECT * FROM l1 UNION ALL SELECT * FROM l2
        |  UNION ALL SELECT * FROM l3 UNION ALL SELECT * FROM l4) u
        |ORDER BY node, depth, anc""".stripMargin,

    // two peel rounds, each a full triangle enumeration (x<y<z join
    // chain) + per-edge support count + filter, chained
    "q157_ktruss" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e0 AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |       FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |       GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |t1 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |       FROM e0 e1 JOIN e0 e2 ON e1.a = e2.a AND e1.b < e2.b
        |       JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b),
        |s1 AS (SELECT a, b, COUNT(*) AS s FROM (
        |         SELECT x AS a, y AS b FROM t1
        |         UNION ALL SELECT x AS a, z AS b FROM t1
        |         UNION ALL SELECT y AS a, z AS b FROM t1) u GROUP BY a, b),
        |e1 AS (SELECT e0.a, e0.b FROM e0 LEFT JOIN s1
        |         ON e0.a = s1.a AND e0.b = s1.b
        |       WHERE COALESCE(s1.s, 0) >= 1),
        |t2 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |       FROM e1 JOIN e1 e2 ON e1.a = e2.a AND e1.b < e2.b
        |       JOIN e1 e3 ON e3.a = e1.b AND e3.b = e2.b),
        |s2 AS (SELECT a, b, COUNT(*) AS s FROM (
        |         SELECT x AS a, y AS b FROM t2
        |         UNION ALL SELECT x AS a, z AS b FROM t2
        |         UNION ALL SELECT y AS a, z AS b FROM t2) u GROUP BY a, b),
        |e2 AS (SELECT e1.a, e1.b FROM e1 LEFT JOIN s2
        |         ON e1.a = s2.a AND e1.b = s2.b
        |       WHERE COALESCE(s2.s, 0) >= 1)
        |SELECT a, b FROM e2 ORDER BY a, b""".stripMargin,

    "q158_fd_check" -> Seq(
      ("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus"),
      ("o_orderkey", "o_orderstatus"))
      .map { case (a, b) =>
        s"""SELECT '$a' AS det, '$b' AS dep, COUNT(*) AS n_det,
          |       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_pairs,
          |       CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_deps,
          |       CAST(CASE WHEN MAX(c) IS NULL OR MAX(c) = 1
          |            THEN 1 ELSE 0 END AS BIGINT) AS holds
          |FROM (SELECT x, COUNT(*) AS c FROM
          |        (SELECT DISTINCT $a AS x, $b AS y FROM orders
          |         WHERE $a IS NOT NULL AND $b IS NOT NULL) d
          |      GROUP BY x) g""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY det, dep"),

    // per-seed BFS replayed as chained CTEs (one per hop), then the
    // harmonic aggregate — 6 // dist is exact for every dist ≤ 3
    "q155_harmonic" ->
      """WITH e0 AS (SELECT DISTINCT 2*l_partkey AS s, 2*l_suppkey+1 AS d
        |            FROM lineitem),
        |e AS (SELECT DISTINCT s, d FROM (SELECT s, d FROM e0
        |        UNION ALL SELECT d AS s, s AS d FROM e0) t),
        |sd AS (SELECT DISTINCT 2*s_suppkey+1 AS seed FROM supplier
        |       WHERE s_suppkey % 100 = 1),
        |d0 AS (SELECT seed, seed AS node, 0 AS dist FROM sd),
        |d1 AS (SELECT seed, node, MIN(dist) AS dist FROM (
        |         SELECT seed, node, dist FROM d0
        |         UNION ALL SELECT d0.seed, e.d AS node, d0.dist + 1
        |         FROM d0 JOIN e ON d0.node = e.s) t GROUP BY seed, node),
        |d2 AS (SELECT seed, node, MIN(dist) AS dist FROM (
        |         SELECT seed, node, dist FROM d1
        |         UNION ALL SELECT d1.seed, e.d AS node, d1.dist + 1
        |         FROM d1 JOIN e ON d1.node = e.s) t GROUP BY seed, node),
        |d3 AS (SELECT seed, node, MIN(dist) AS dist FROM (
        |         SELECT seed, node, dist FROM d2
        |         UNION ALL SELECT d2.seed, e.d AS node, d2.dist + 1
        |         FROM d2 JOIN e ON d2.node = e.s) t GROUP BY seed, node),
        |sc AS (SELECT seed, COUNT(*) AS n_reached,
        |         CAST(SUM(6 // dist) AS BIGINT) AS harm_num
        |       FROM d3 WHERE dist > 0 GROUP BY seed)
        |SELECT sd.seed, COALESCE(sc.n_reached, 0) AS n_reached,
        |       COALESCE(sc.harm_num, 0) AS harm_num,
        |       CAST(6 AS BIGINT) AS harm_den
        |FROM sd LEFT JOIN sc ON sd.seed = sc.seed
        |ORDER BY sd.seed""".stripMargin,

    "q156_make_changelog" -> {
      val c = CENTS.format("o_totalprice")
      s"""WITH b AS (SELECT o_orderkey AS k, o_custkey, $c AS price_c
        |           FROM orders),
        |tg AS (SELECT k, o_custkey,
        |         CASE WHEN k % 5 = 0 THEN price_c + 100 ELSE price_c END
        |           AS price_c
        |       FROM b WHERE k % 7 <> 0
        |       UNION ALL
        |       SELECT k + 1000000000, o_custkey, price_c FROM b
        |       WHERE k % 11 = 0),
        |j AS (SELECT COALESCE(b.k, tg.k) AS o_orderkey, b.k AS bk,
        |        tg.k AS tk, b.o_custkey AS bc, b.price_c AS bp,
        |        tg.o_custkey AS tc, tg.price_c AS tp
        |      FROM b FULL OUTER JOIN tg ON b.k = tg.k)
        |SELECT o_orderkey,
        |       CASE WHEN tk IS NULL THEN 'D' ELSE 'U' END AS op,
        |       CAST(1 AS BIGINT) AS seq,
        |       tc AS o_custkey, tp AS price_c
        |FROM j
        |WHERE bk IS NULL OR tk IS NULL OR bc <> tc OR bp <> tp
        |ORDER BY o_orderkey""".stripMargin
    },

    // personalized PageRank: q111's chained-CTE replay with the teleport
    // term landing on seed nodes only
    "q153_ppr" ->
      """WITH e0 AS (SELECT DISTINCT 2*l_partkey AS s, 2*l_suppkey+1 AS d
        |            FROM lineitem),
        |e AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0),
        |sd AS (SELECT DISTINCT 2*s_suppkey+1 AS node FROM supplier
        |       WHERE s_nationkey = 1),
        |n AS (SELECT node, MAX(seed) AS seed FROM (
        |        SELECT s AS node, 0 AS seed FROM e
        |        UNION ALL SELECT d AS node, 0 AS seed FROM e
        |        UNION ALL SELECT node, 1 AS seed FROM sd) t GROUP BY node),
        |deg AS (SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s),
        |r0 AS (SELECT node, seed, CAST(seed * 1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.d AS node, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r1 AS (SELECT n.node, n.seed,
        |         n.seed*150000 + ((85 * COALESCE(c1.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.d AS node, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r2 AS (SELECT n.node, n.seed,
        |         n.seed*150000 + ((85 * COALESCE(c2.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.d AS node, CAST(SUM(r2.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r2 ON e.s = r2.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r3 AS (SELECT n.node, n.seed,
        |         n.seed*150000 + ((85 * COALESCE(c3.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, CAST(r AS BIGINT) AS ppr FROM r3
        |ORDER BY node""".stripMargin,

    "q149_link_predict" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e AS (SELECT CAST(x.p AS BIGINT) AS a, CAST(y.p AS BIGINT) AS b
        |      FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        |      GROUP BY x.p, y.p HAVING COUNT(*) >= 2),
        |deg AS (SELECT n, COUNT(*) AS d FROM (SELECT a AS n FROM e
        |          UNION ALL SELECT b AS n FROM e) t GROUP BY n),
        |nb AS (SELECT t.u, t.x FROM (SELECT a AS u, b AS x FROM e
        |         UNION ALL SELECT b AS u, a AS x FROM e) t
        |       JOIN deg ON deg.n = t.u WHERE deg.d <= 20),
        |dc AS (SELECT x, COUNT(*) AS dc FROM nb GROUP BY x),
        |w AS (SELECT n1.x AS pa, n2.x AS pb, COUNT(*) AS common
        |      FROM nb n1 JOIN nb n2 ON n1.u = n2.u AND n1.x < n2.x
        |      GROUP BY n1.x, n2.x HAVING COUNT(*) >= 2),
        |na AS (SELECT w.* FROM w WHERE NOT EXISTS
        |        (SELECT 1 FROM e WHERE e.a = w.pa AND e.b = w.pb))
        |SELECT na.pa AS a, na.pb AS b, na.common,
        |       d1.dc + d2.dc - na.common AS jaccard_den
        |FROM na JOIN dc d1 ON d1.x = na.pa JOIN dc d2 ON d2.x = na.pb
        |ORDER BY a, b""".stripMargin,

    "q146_modularity" ->
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
        |       WHERE rn = 1),
        |mm AS (SELECT COUNT(*) AS m FROM e0),
        |deg AS (SELECT n, COUNT(*) AS deg FROM (SELECT a AS n FROM e0
        |          UNION ALL SELECT b AS n FROM e0) t GROUP BY n),
        |comm AS (SELECT l.lbl AS label, COUNT(*) AS n_nodes,
        |           CAST(SUM(deg.deg) AS BIGINT) AS deg_sum
        |         FROM l2 l JOIN deg ON l.node = deg.n GROUP BY l.lbl),
        |intra AS (SELECT la.lbl AS label, COUNT(*) AS intra_edges
        |          FROM e0 JOIN l2 la ON e0.a = la.node
        |                  JOIN l2 lb ON e0.b = lb.node
        |          WHERE la.lbl = lb.lbl GROUP BY la.lbl)
        |SELECT c.label, c.n_nodes, c.deg_sum,
        |       COALESCE(i.intra_edges, 0) AS intra_edges,
        |       CAST(4 * mm.m * COALESCE(i.intra_edges, 0)
        |            - c.deg_sum * c.deg_sum AS BIGINT) AS q_num,
        |       CAST(4 * mm.m * mm.m AS BIGINT) AS q_den
        |FROM comm c LEFT JOIN intra i ON c.label = i.label, mm
        |ORDER BY c.label""".stripMargin,

    "q145_skyline" -> {
      val v = CENTS.format("o_totalprice")
      s"""WITH c AS (SELECT o_custkey, COUNT(*) AS n_orders,
        |             CAST(SUM($v) AS BIGINT) AS spend_c
        |           FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders, spend_c FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM c c2
        |                  WHERE c2.n_orders > c.n_orders
        |                    AND c2.spend_c > c.spend_c)
        |ORDER BY o_custkey""".stripMargin
    },

    // warm(2) after cold(2) ≡ one 4-round replay: the oracle never sees
    // the seam (purity of the per-round update)
    "q213_pagerank_warm" ->
      """WITH e0 AS (SELECT DISTINCT 2*c_custkey AS s, 2*c_nationkey+1 AS d
        |            FROM customer),
        |e AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0),
        |n AS (SELECT DISTINCT s AS node FROM e),
        |deg AS (SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.d AS node, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r1 AS (SELECT n.node, 150000 + ((85 * COALESCE(c1.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.d AS node, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r2 AS (SELECT n.node, 150000 + ((85 * COALESCE(c2.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (SELECT e.d AS node, CAST(SUM(r2.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r2 ON e.s = r2.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r3 AS (SELECT n.node, 150000 + ((85 * COALESCE(c3.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c3 ON n.node = c3.node),
        |c4 AS (SELECT e.d AS node, CAST(SUM(r3.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r3 ON e.s = r3.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r4 AS (SELECT n.node, 150000 + ((85 * COALESCE(c4.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c4 ON n.node = c4.node)
        |SELECT node, r AS pr FROM r4 ORDER BY node""".stripMargin,

    "q212_skyline3d" -> {
      val v = CENTS.format("o_totalprice")
      s"""WITH c AS (SELECT o_custkey, COUNT(*) AS n_orders,
        |             CAST(SUM($v) AS BIGINT) AS spend_c,
        |             MAX(epoch_us(o_orderdate) // 86400000000) AS recency_d
        |           FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders, spend_c, recency_d FROM c
        |WHERE NOT EXISTS (SELECT 1 FROM c c2
        |                  WHERE c2.n_orders > c.n_orders
        |                    AND c2.spend_c > c.spend_c
        |                    AND c2.recency_d > c.recency_d)
        |ORDER BY o_custkey""".stripMargin
    },

    "q144_bucketed_join" ->
      s"""SELECT o.o_orderstatus, COUNT(*) AS n,
        |       CAST(SUM(${CENTS.format("l.l_extendedprice")}) AS BIGINT) AS sum_p
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus""".stripMargin,

    "q142_stream_agg_state" -> {
      val v = CENTS.format("value")
      s"""SELECT user_id, COUNT(v) AS n, CAST(SUM(v) AS BIGINT) AS sum_x,
        |       MIN(v) AS min_x, MAX(v) AS max_x
        |FROM (SELECT user_id, $v AS v FROM events
        |      WHERE event_type = 'click') t
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q98_stream_dedup" ->
      """SELECT event_id, user_id, epoch_us(ts) AS tus,
        |  CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |FROM events WHERE event_type = 'click'
        |ORDER BY event_id""".stripMargin,

    "q214_pagerank_delta" ->
      """WITH e0 AS (SELECT DISTINCT 2*c_custkey AS s, 2*c_nationkey+1 AS d
        |            FROM customer),
        |e AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0),
        |n AS (SELECT DISTINCT s AS node FROM e),
        |deg AS (SELECT s, COUNT(*) AS outdeg FROM e GROUP BY s),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT e.d AS node, CAST(SUM(r0.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r1 AS (SELECT n.node, 150000 + ((85 * COALESCE(c1.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (SELECT e.d AS node, CAST(SUM(r1.r // deg.outdeg) AS BIGINT) AS sc
        |       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON deg.s = e.s
        |       GROUP BY e.d),
        |r2 AS (SELECT n.node, 150000 + ((85 * COALESCE(c2.sc, 0)) // 100) AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.node),
        |d0 AS (SELECT DISTINCT 2*n_nationkey+1 AS s, 9000000 + n_regionkey AS d
        |       FROM nation),
        |de AS (SELECT s, d FROM e UNION ALL SELECT s, d FROM d0
        |       UNION ALL SELECT d AS s, s AS d FROM d0),
        |dn AS (SELECT DISTINCT s AS node FROM de),
        |ddeg AS (SELECT s, COUNT(*) AS outdeg FROM de GROUP BY s),
        |w0 AS (SELECT dn.node, CAST(COALESCE(r2.r, 1000000) AS BIGINT) AS r
        |       FROM dn LEFT JOIN r2 ON dn.node = r2.node),
        |x1 AS (SELECT de.d AS node, CAST(SUM(w0.r // ddeg.outdeg) AS BIGINT) AS sc
        |       FROM de JOIN w0 ON de.s = w0.node JOIN ddeg ON ddeg.s = de.s
        |       GROUP BY de.d),
        |w1 AS (SELECT dn.node, 150000 + ((85 * COALESCE(x1.sc, 0)) // 100) AS r
        |       FROM dn LEFT JOIN x1 ON dn.node = x1.node),
        |x2 AS (SELECT de.d AS node, CAST(SUM(w1.r // ddeg.outdeg) AS BIGINT) AS sc
        |       FROM de JOIN w1 ON de.s = w1.node JOIN ddeg ON ddeg.s = de.s
        |       GROUP BY de.d),
        |w2 AS (SELECT dn.node, 150000 + ((85 * COALESCE(x2.sc, 0)) // 100) AS r
        |       FROM dn LEFT JOIN x2 ON dn.node = x2.node),
        |x3 AS (SELECT de.d AS node, CAST(SUM(w2.r // ddeg.outdeg) AS BIGINT) AS sc
        |       FROM de JOIN w2 ON de.s = w2.node JOIN ddeg ON ddeg.s = de.s
        |       GROUP BY de.d),
        |w3 AS (SELECT dn.node, 150000 + ((85 * COALESCE(x3.sc, 0)) // 100) AS r
        |       FROM dn LEFT JOIN x3 ON dn.node = x3.node)
        |SELECT node, r AS pr FROM w3 ORDER BY node""".stripMargin,

    // decimal-log binning replayed with exact STRING arithmetic (first 2
    // digits kept, rest zeroed) — a different exact formulation than the
    // Spark side's integer div/multiply, so the hash match cross-checks
    // the binning itself
    "q215_logsketch_quantiles" ->
      s"""WITH v AS (SELECT l_returnflag AS g,
        |             ${CENTS.format("l_extendedprice")} AS v FROM lineitem),
        |b AS (SELECT g, CAST(substr(CAST(v AS VARCHAR), 1,
        |                       LEAST(length(CAST(v AS VARCHAR)), 2))
        |               || repeat('0',
        |                    GREATEST(length(CAST(v AS VARCHAR)) - 2, 0))
        |               AS BIGINT) AS edge
        |      FROM v),
        |sk AS (SELECT g, edge, COUNT(*) AS cnt FROM b GROUP BY g, edge),
        |c AS (SELECT g, edge,
        |        CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY edge) AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |      FROM sk)
        |SELECT g, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 2 >= n * 1 THEN edge END) AS q_1_2,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN edge END) AS q_9_10
        |FROM c GROUP BY g ORDER BY g""".stripMargin,

    // the oracle sketches DIRECTLY at the coarse level — the gate rolls
    // fine sketches up, so the hash match proves the merge contract on
    // real data
    "q216_logsketch_rollup" ->
      s"""WITH v AS (SELECT l_returnflag AS g,
        |             ${CENTS.format("l_extendedprice")} AS v FROM lineitem),
        |b AS (SELECT g, CAST(substr(CAST(v AS VARCHAR), 1,
        |                       LEAST(length(CAST(v AS VARCHAR)), 2))
        |               || repeat('0',
        |                    GREATEST(length(CAST(v AS VARCHAR)) - 2, 0))
        |               AS BIGINT) AS edge
        |      FROM v),
        |sk AS (SELECT g, edge, COUNT(*) AS cnt FROM b GROUP BY g, edge),
        |c AS (SELECT g, edge,
        |        CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY edge) AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |      FROM sk)
        |SELECT g, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 4 >= n * 1 THEN edge END) AS q_1_4,
        |       MIN(CASE WHEN cum * 4 >= n * 3 THEN edge END) AS q_3_4
        |FROM c GROUP BY g ORDER BY g""".stripMargin,

    // weighted quantiles at bin width 1 are exact, so the oracle is the
    // weight-cumulative window over the raw values (RANGE frame: tied
    // values share the full tied cumulative, exactly the slot semantics)
    "q217_qsketch_weighted" ->
      s"""WITH v AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v,
        |             ${CENTS.format("l_extendedprice")} AS w FROM lineitem),
        |c AS (SELECT l_returnflag, v,
        |        CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS BIGINT) AS cum,
        |        CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |      FROM v)
        |SELECT l_returnflag, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 2 >= n * 1 THEN v END) AS q_1_2,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS q_9_10
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q218_logsketch_weighted" ->
      s"""WITH v AS (SELECT l_returnflag AS g,
        |             ${CENTS.format("l_extendedprice")} AS v,
        |             CAST(l_quantity AS BIGINT) AS w FROM lineitem),
        |b AS (SELECT g, w, CAST(substr(CAST(v AS VARCHAR), 1,
        |                       LEAST(length(CAST(v AS VARCHAR)), 2))
        |               || repeat('0',
        |                    GREATEST(length(CAST(v AS VARCHAR)) - 2, 0))
        |               AS BIGINT) AS edge
        |      FROM v),
        |sk AS (SELECT g, edge, CAST(SUM(w) AS BIGINT) AS cnt
        |       FROM b GROUP BY g, edge),
        |c AS (SELECT g, edge,
        |        CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY edge) AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |      FROM sk)
        |SELECT g, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 2 >= n * 1 THEN edge END) AS q_1_2,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN edge END) AS q_9_10
        |FROM c GROUP BY g ORDER BY g""".stripMargin,

    // the streaming fold == the batch sketch (exact monoid), so the
    // oracle is the direct per-user binned cumulative window (width-500
    // slots over [0, 50000); values >= hi land on the overflow answer hi)
    "q219_stream_qsketch" -> {
      val v = CENTS.format("value")
      s"""WITH t AS (SELECT user_id, $v AS v FROM events
        |           WHERE event_type = 'click'),
        |b AS (SELECT user_id,
        |        CASE WHEN v >= 50000 THEN 50000 ELSE (v // 500) * 500 END AS edge
        |      FROM t),
        |c AS (SELECT user_id, edge,
        |        COUNT(*) OVER (PARTITION BY user_id ORDER BY edge) AS cum,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n
        |      FROM b)
        |SELECT user_id, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 2 >= n * 1 THEN edge END) AS p50,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN edge END) AS p90
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    // signed decimal-log binning replayed with exact STRING arithmetic on
    // the magnitude: positives keep the first-2-digits floor edge;
    // negatives take the negated CEILING (floor + one bucket width unless
    // already on an edge) — a different exact formulation than the Spark
    // side's integer div/abs, so the hash match cross-checks the signed
    // binning itself
    "q220_logsketch_signed" ->
      s"""WITH v AS (SELECT l_returnflag AS g,
        |             ${CENTS.format("l_extendedprice")} - 5000000 AS v
        |           FROM lineitem),
        |a AS (SELECT g, v, ABS(v) AS m FROM v),
        |b AS (SELECT g, v, m,
        |        CAST(substr(CAST(m AS VARCHAR), 1,
        |               LEAST(length(CAST(m AS VARCHAR)), 2))
        |          || repeat('0', GREATEST(length(CAST(m AS VARCHAR)) - 2, 0))
        |          AS BIGINT) AS fe,
        |        CAST('1' || repeat('0',
        |               GREATEST(length(CAST(m AS VARCHAR)) - 2, 0))
        |          AS BIGINT) AS pw
        |      FROM a),
        |e AS (SELECT g, CASE WHEN v >= 0 THEN fe
        |                     WHEN m = fe THEN -fe
        |                     ELSE -(fe + pw) END AS edge FROM b),
        |sk AS (SELECT g, edge, COUNT(*) AS cnt FROM e GROUP BY g, edge),
        |c AS (SELECT g, edge,
        |        CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY edge) AS BIGINT) AS cum,
        |        CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |      FROM sk)
        |SELECT g, MAX(n) AS n,
        |       MIN(CASE WHEN cum * 10 >= n * 1 THEN edge END) AS q_1_10,
        |       MIN(CASE WHEN cum * 2 >= n * 1 THEN edge END) AS q_1_2,
        |       MIN(CASE WHEN cum * 10 >= n * 9 THEN edge END) AS q_9_10
        |FROM c GROUP BY g ORDER BY g""".stripMargin,

    // HITS cold round on e0, then TWO warm rounds on the delta'd edge set
    // seeded from the cold (h1, a1) — absent nodes seed cold (h=10000,
    // a=0); warm rounds replay as cold continuation CTEs
    "q221_hits_delta" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT 2*l_partkey AS s, 2*l_suppkey+1 AS d
        |            FROM lineitem),
        |n AS MATERIALIZED (SELECT s AS node FROM e0 UNION SELECT d AS node FROM e0),
        |s0 AS MATERIALIZED (SELECT node, CAST(10000 AS BIGINT) AS h FROM n),
        |ca1 AS MATERIALIZED (SELECT e0.d AS node, CAST(SUM(s0.h) AS BIGINT) AS raw
        |        FROM e0 JOIN s0 ON e0.s = s0.node GROUP BY e0.d),
        |a1 AS MATERIALIZED (SELECT n.node, CAST(COALESCE(
        |         (ca1.raw * 10000) // (SELECT MAX(raw) FROM ca1), 0) AS BIGINT) AS a
        |       FROM n LEFT JOIN ca1 ON n.node = ca1.node),
        |ch1 AS MATERIALIZED (SELECT e0.s AS node, CAST(SUM(a1.a) AS BIGINT) AS raw
        |        FROM e0 JOIN a1 ON e0.d = a1.node GROUP BY e0.s),
        |h1 AS MATERIALIZED (SELECT n.node, CAST(COALESCE(
        |         (ch1.raw * 10000) // (SELECT MAX(raw) FROM ch1), 0) AS BIGINT) AS h
        |       FROM n LEFT JOIN ch1 ON n.node = ch1.node),
        |d0 AS MATERIALIZED (SELECT DISTINCT 2*n_nationkey+1 AS s, 9000000 + n_regionkey AS d
        |       FROM nation),
        |de AS MATERIALIZED (SELECT s, d FROM e0 UNION ALL SELECT s, d FROM d0),
        |dn AS MATERIALIZED (SELECT s AS node FROM de UNION SELECT d AS node FROM de),
        |w0 AS MATERIALIZED (SELECT dn.node, CAST(COALESCE(h1.h, 10000) AS BIGINT) AS h,
        |              CAST(COALESCE(a1.a, 0) AS BIGINT) AS a
        |       FROM dn LEFT JOIN h1 ON dn.node = h1.node
        |                LEFT JOIN a1 ON dn.node = a1.node),
        |xca1 AS MATERIALIZED (SELECT de.d AS node, CAST(SUM(w0.h) AS BIGINT) AS raw
        |         FROM de JOIN w0 ON de.s = w0.node GROUP BY de.d),
        |wa1 AS MATERIALIZED (SELECT dn.node, CAST(COALESCE(
        |          (xca1.raw * 10000) // (SELECT MAX(raw) FROM xca1), 0) AS BIGINT) AS a
        |        FROM dn LEFT JOIN xca1 ON dn.node = xca1.node),
        |xch1 AS MATERIALIZED (SELECT de.s AS node, CAST(SUM(wa1.a) AS BIGINT) AS raw
        |         FROM de JOIN wa1 ON de.d = wa1.node GROUP BY de.s),
        |wh1 AS MATERIALIZED (SELECT dn.node, CAST(COALESCE(
        |          (xch1.raw * 10000) // (SELECT MAX(raw) FROM xch1), 0) AS BIGINT) AS h
        |        FROM dn LEFT JOIN xch1 ON dn.node = xch1.node),
        |xca2 AS MATERIALIZED (SELECT de.d AS node, CAST(SUM(wh1.h) AS BIGINT) AS raw
        |         FROM de JOIN wh1 ON de.s = wh1.node GROUP BY de.d),
        |wa2 AS MATERIALIZED (SELECT dn.node, CAST(COALESCE(
        |          (xca2.raw * 10000) // (SELECT MAX(raw) FROM xca2), 0) AS BIGINT) AS a
        |        FROM dn LEFT JOIN xca2 ON dn.node = xca2.node),
        |xch2 AS MATERIALIZED (SELECT de.s AS node, CAST(SUM(wa2.a) AS BIGINT) AS raw
        |         FROM de JOIN wa2 ON de.d = wa2.node GROUP BY de.s),
        |wh2 AS MATERIALIZED (SELECT dn.node, CAST(COALESCE(
        |          (xch2.raw * 10000) // (SELECT MAX(raw) FROM xch2), 0) AS BIGINT) AS h
        |        FROM dn LEFT JOIN xch2 ON dn.node = xch2.node)
        |SELECT wh2.node, wh2.h AS hub, wa2.a AS auth
        |FROM wh2 JOIN wa2 ON wh2.node = wa2.node ORDER BY wh2.node""".stripMargin,

    // LPA cold round on e0, then TWO warm rounds on the delta'd edge set
    // seeded from the cold labels — absent nodes seed cold (label = own
    // id); plurality vote with smallest-label tiebreak replays as
    // ROW_NUMBER over (c DESC, lbl)
    "q222_lpa_delta" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT CAST(2*l_partkey AS BIGINT) AS a,
        |                            CAST(2*l_suppkey+1 AS BIGINT) AS b
        |            FROM lineitem),
        |e AS MATERIALIZED (SELECT DISTINCT s, d FROM (
        |        SELECT a AS s, b AS d FROM e0
        |        UNION ALL SELECT b AS s, a AS d FROM e0) t WHERE s <> d),
        |l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lbl FROM e),
        |v1 AS MATERIALIZED (SELECT e.d AS node, l.lbl AS lbl, COUNT(*) AS c
        |       FROM e JOIN l0 l ON e.s = l.node GROUP BY e.d, l.lbl),
        |l1 AS MATERIALIZED (SELECT node, lbl FROM (
        |         SELECT node, lbl, ROW_NUMBER() OVER (
        |           PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM v1)
        |       WHERE rn = 1),
        |d0 AS MATERIALIZED (SELECT DISTINCT CAST(2*n_nationkey+1 AS BIGINT) AS a,
        |                       CAST(9000000+n_regionkey AS BIGINT) AS b
        |       FROM nation),
        |de AS MATERIALIZED (SELECT DISTINCT s, d FROM (
        |        SELECT a AS s, b AS d FROM e0 UNION ALL SELECT b, a FROM e0
        |        UNION ALL SELECT a, b FROM d0 UNION ALL SELECT b, a FROM d0) t
        |       WHERE s <> d),
        |dn AS MATERIALIZED (SELECT DISTINCT s AS node FROM de),
        |w0 AS MATERIALIZED (SELECT dn.node, COALESCE(l1.lbl, dn.node) AS lbl
        |       FROM dn LEFT JOIN l1 ON dn.node = l1.node),
        |wv1 AS MATERIALIZED (SELECT de.d AS node, w.lbl AS lbl, COUNT(*) AS c
        |        FROM de JOIN w0 w ON de.s = w.node GROUP BY de.d, w.lbl),
        |wl1 AS MATERIALIZED (SELECT node, lbl FROM (
        |          SELECT node, lbl, ROW_NUMBER() OVER (
        |            PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM wv1)
        |        WHERE rn = 1),
        |wv2 AS MATERIALIZED (SELECT de.d AS node, w.lbl AS lbl, COUNT(*) AS c
        |        FROM de JOIN wl1 w ON de.s = w.node GROUP BY de.d, w.lbl),
        |wl2 AS MATERIALIZED (SELECT node, lbl FROM (
        |          SELECT node, lbl, ROW_NUMBER() OVER (
        |            PARTITION BY node ORDER BY c DESC, lbl) AS rn FROM wv2)
        |        WHERE rn = 1)
        |SELECT node, lbl AS label FROM wl2 ORDER BY node""".stripMargin,

    // md5-HLL register replay: bucket = first 2 hex chars (base-16 via
    // strpos arithmetic), rho = 1 + leading zero bits of the next 16
    // chars (ltrim zero-count + lexicographic nibble compare)
    "q223_distinct_sketch" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |br AS (SELECT event_type,
        |         CAST(16 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
        |              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
        |           AS BIGINT) AS bucket,
        |         ltrim(substr(hx, 3, 16), '0') AS tr
        |       FROM h),
        |rr AS (SELECT event_type, bucket,
        |         CASE WHEN length(tr) = 0 THEN CAST(65 AS BIGINT)
        |              ELSE CAST(4 * (16 - length(tr))
        |                + CASE WHEN substr(tr, 1, 1) >= '8' THEN 0
        |                       WHEN substr(tr, 1, 1) >= '4' THEN 1
        |                       WHEN substr(tr, 1, 1) >= '2' THEN 2
        |                       ELSE 3 END + 1 AS BIGINT) END AS r
        |       FROM br)
        |SELECT event_type, bucket, MAX(r) AS r
        |FROM rr GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // the DIRECT global registers — the gate reaches the same cells via
    // the per-type stored vectors, which is exactly the cube contract
    "q224_distinct_rollup" ->
      """WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |br AS (SELECT
        |         CAST(16 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
        |              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
        |           AS BIGINT) AS bucket,
        |         ltrim(substr(hx, 3, 16), '0') AS tr
        |       FROM h),
        |rr AS (SELECT bucket,
        |         CASE WHEN length(tr) = 0 THEN CAST(65 AS BIGINT)
        |              ELSE CAST(4 * (16 - length(tr))
        |                + CASE WHEN substr(tr, 1, 1) >= '8' THEN 0
        |                       WHEN substr(tr, 1, 1) >= '4' THEN 1
        |                       WHEN substr(tr, 1, 1) >= '2' THEN 2
        |                       ELSE 3 END + 1 AS BIGINT) END AS r
        |       FROM br)
        |SELECT bucket, MAX(r) AS r FROM rr GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    // the BATCH registers of per-user distinct click days — the gate
    // reaches the same cells by folding 3 micro-batches through the
    // streaming maintainer (register max is idempotent, so any chunking
    // — and any duplicate delivery — lands here)
    "q225_stream_distinct" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events WHERE event_type = 'click'),
        |h AS (SELECT user_id, md5(CAST(day AS VARCHAR)) AS hx
        |      FROM d WHERE day IS NOT NULL),
        |br AS (SELECT user_id,
        |         CAST(16 * (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)
        |              + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1)
        |           AS BIGINT) AS bucket,
        |         ltrim(substr(hx, 3, 16), '0') AS tr
        |       FROM h),
        |rr AS (SELECT user_id, bucket,
        |         CASE WHEN length(tr) = 0 THEN CAST(65 AS BIGINT)
        |              ELSE CAST(4 * (16 - length(tr))
        |                + CASE WHEN substr(tr, 1, 1) >= '8' THEN 0
        |                       WHEN substr(tr, 1, 1) >= '4' THEN 1
        |                       WHEN substr(tr, 1, 1) >= '2' THEN 2
        |                       ELSE 3 END + 1 AS BIGINT) END AS r
        |       FROM br)
        |SELECT user_id, bucket, MAX(r) AS r
        |FROM rr GROUP BY user_id, bucket
        |ORDER BY user_id, bucket""".stripMargin,

    // the identical shift/mask interleave, generated by Layout.zValueSql
    // from the same (bits, dims) spec the Spark side uses
    "q226_zorder" -> {
      val z = graft.operators.Layout.zValueSql(Seq("x", "y"), 21)
      s"""WITH c AS (SELECT o_orderkey, o_custkey AS x,
         |             epoch_us(o_orderdate) // 86400000000 AS y
         |           FROM orders)
         |SELECT o_orderkey, CAST($z AS BIGINT) AS zval FROM c
         |ORDER BY o_orderkey""".stripMargin
    },

    // q90's signature recipe, then the incremental contract replayed
    // directly: delta docs (doc_id % 3 = 0) vs corpus bands + earlier
    // delta bands, agreement >= 3/4 of 16 positions, MIN match id
    "q227_dedup_delta" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS MATERIALIZED (SELECT DISTINCT doc_id,
        |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM toks, UNNEST(range(1, len(ws)-1)) AS t(i)),
        |hs AS MATERIALIZED (SELECT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT % 1000000007 AS h FROM sh),
        |hf AS (SELECT i, (2654435761 * (i+1)) % 1000000007 AS a,
        |              (40503 * (i+1)) % 1000000007 AS b
        |       FROM (SELECT UNNEST(range(16)) AS i)),
        |sig AS MATERIALIZED (SELECT doc_id, i, MIN((a*h + b) % 1000000007) AS mh
        |        FROM hs CROSS JOIN hf GROUP BY doc_id, i),
        |bsig AS MATERIALIZED (SELECT doc_id, i // 2 AS band,
        |           string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bs
        |         FROM sig GROUP BY doc_id, i // 2),
        |bd AS MATERIALIZED (SELECT * FROM bsig WHERE doc_id % 3 = 0),
        |bc AS MATERIALIZED (SELECT * FROM bsig WHERE doc_id % 3 <> 0),
        |cand AS MATERIALIZED (
        |  SELECT DISTINCT a.doc_id AS doc, b.doc_id AS other
        |  FROM bd a JOIN bc b ON a.band = b.band AND a.bs = b.bs
        |  UNION
        |  SELECT DISTINCT a.doc_id AS doc, b.doc_id AS other
        |  FROM bd a JOIN bd b ON a.band = b.band AND a.bs = b.bs
        |                     AND b.doc_id < a.doc_id),
        |ag AS MATERIALIZED (
        |  SELECT c.doc, c.other, COUNT(*) AS agree
        |  FROM cand c JOIN sig sa ON c.doc = sa.doc_id
        |              JOIN sig sb ON c.other = sb.doc_id AND sa.i = sb.i
        |  WHERE sa.mh = sb.mh GROUP BY c.doc, c.other),
        |hits AS MATERIALIZED (SELECT doc, MIN(other) AS dup_of FROM ag
        |        WHERE agree * 4 >= 3 * 16 GROUP BY doc),
        |u AS (SELECT DISTINCT doc_id FROM sig WHERE doc_id % 3 = 0)
        |SELECT u.doc_id, hits.dup_of FROM u
        |LEFT JOIN hits ON u.doc_id = hits.doc
        |ORDER BY u.doc_id""".stripMargin,

    // md5-CMS counter replay: depth row i takes hex chars [4i+1, 4i+4]
    // as a 16-bit slice, bucket = slice mod 128 (exact — 128 divides
    // 2^16), counter slot = i*128 + bucket, count per (type, slot)
    "q228_cms_registers" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events WHERE user_id IS NOT NULL),
        |s AS (SELECT event_type,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot
        |      FROM h, UNNEST(range(4)) AS t(i))
        |SELECT event_type, slot, CAST(COUNT(*) AS BIGINT) AS c
        |FROM s GROUP BY event_type, slot
        |ORDER BY event_type, slot""".stripMargin,
  )
}

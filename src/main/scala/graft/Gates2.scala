package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Gate-registry shard 2 (q76–q113): each gate's Spark lambda and
  * its DuckDB oracle SQL side by side — pure relocation of the
  * [[SparkEntry]] registry (r15 verdict #6), no behavior change.
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] assemble the shards.
  */
private[graft] object Gates2 {
  import GateSupport._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    "q76_salted_join" -> ((s, dir) => {
      val orders = s.read.parquet(t(dir, "orders")).select("o_orderkey", "o_custkey")
      // integral quantities summed as BIGINT — double summation is
      // order-dependent and would not hash-match across engines
      val line = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(org.apache.spark.sql.types.LongType).as("qty"))
      graft.operators.Salted.join(line, orders, key = "o_orderkey",
          saltCol = "l_linenumber", factor = 4)
        .groupBy("o_orderkey", "o_custkey")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderkey")
    }),

    // ── hot-keys-only salted join: the partial-salt variant must ALSO be
    // result-invisible — same oracle family as q76, but only the keys the
    // frequency probe flags pay the replication; the rest plain-joins and
    // the branches union ─────────────────────────────────────────────────
    "q78_salted_hot_join" -> ((s, dir) => {
      val orders = s.read.parquet(t(dir, "orders")).select("o_orderkey", "o_custkey")
      val line = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(org.apache.spark.sql.types.LongType).as("qty"))
      val hot = graft.operators.Salted.hotKeys(line, "o_orderkey", minCount = 5L)
      graft.operators.Salted.join(line, orders, key = "o_orderkey",
          saltCol = "l_linenumber", factor = 4, hotKeys = Some(hot))
        .groupBy("o_orderkey", "o_custkey")
        .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_lines"))
        .orderBy("o_orderkey")
    }),

    // ── heavy hitters at a DISCRIMINATING threshold (den=32 sits inside
    // the word-frequency distribution: a couple of words fall below n/32,
    // where q72's den=64 admits nearly the whole vocabulary) — the exact
    // boundary placement is what the recount must reproduce. The operator's
    // certificate/fallback regime itself is adversarially spec-gated
    // (HeavyHittersSpec), since no corpus this small can decrement ────────
    "q79_heavy_hitters_low" -> ((s, dir) =>
      graft.operators.HeavyHitters.frequentTerms(
        s.read.parquet(t(dir, "documents")), den = 32)),

    // ── deterministic k-per-group cap (domain capping): each lang keeps
    // its 70 smallest-hash docs (zh overridden to 20) — en (218 docs)
    // truncates, fr (64) passes whole; NO per-group window (global
    // range-rank + O(#groups) broadcast offsets) ─────────────────────────
    "q80_cap_per_group" -> ((s, dir) =>
      graft.operators.Sampling.takePerGroup(
          s.read.parquet(t(dir, "documents")).select("doc_id", "lang"),
          groupCol = "lang", k = 70, caps = Map("zh" -> 20))
        .orderBy("doc_id")),

    // ── exact-substring dedup REWRITE (Lee et al. keep-first): duplicated
    // 8-gram spans lose every non-first occurrence, docs rebuilt from the
    // surviving tokens — q70 measures the duplication, this edits it out ──
    "q81_dedup_spans" -> ((s, dir) =>
      graft.text.Dedup.removeDuplicatedSpans(
        s.read.parquet(t(dir, "documents")), n = 8)),

    // ── hashed-linear classifier inference (fastText/CCNet quality-filter
    // shape): tokens hash into 4096 buckets, the "model" is a weights
    // table the gate derives arithmetically (w = bucket % 2001 − 1000) so
    // the oracle can inline it — the operator only sees a weights DF, as
    // it would a trained model import ───────────────────────────────────
    "q82_quality_linear" -> ((s, dir) => {
      val dim = 4096
      val weights = s.range(dim).select(col("id").as("bucket"),
        ((col("id") % 2001) - 1000).cast("long").as("w_permille"))
      graft.text.TextAnalysis.scoreHashedLinear(
        s.read.parquet(t(dir, "documents")), weights, dim)
    }),

    // ── product-quantization ADC top-k (Jégou et al. 2011): 8 subspaces ×
    // 16-entry codebooks over the integer grid. This gate pins the
    // ENCODE + ADC scoring path with the SQL-replayable seed construction
    // (codebook entry c of subspace s = seed-rank-c's s-th subvector);
    // the learned-codebook path (hash-seeded Lloyd) is spec-gated like
    // the IVF family. Queries/candidates follow q22's split ─────────────
    "q84_pq_adc" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val cand = emb.filter(col("vec_id") >= 5)
      // NULL filter BEFORE the limit: the oracle's e CTE drops NULL
      // embeddings first, so the 16 seed slots must too — without it a
      // NULL row among the 16 lowest vec_ids would diverge the codebooks
      val cb = graft.embed.Pq.seedCodebooks(
        cand.filter(col("embedding").isNotNull).orderBy("vec_id").limit(16), m = 8)
      graft.embed.Pq.topkAdc(emb.filter(col("vec_id") < 5),
        graft.embed.Pq.encode(cand, cb), cb, k = 10)
    }),

    // ── survivor-policy exact dedup: keep the BEST-scored member of each
    // duplicate group (argmax n_chars, tie → min doc_id) — the keep-one
    // choice a pipeline makes once a quality signal exists; hashed
    // 16-byte-key scale path ────────────────────────────────────────────
    "q85_dedup_best" -> ((s, dir) =>
      graft.text.Dedup.exactBest(s.read.parquet(t(dir, "documents")),
        "n_chars", verifyExact = false)),

    // ── exact-quantile corpus filter: keep docs at/above the 7/10
    // empirical quantile of n_chars — fraction-budgeted quality filtering
    // with a deterministic threshold (exact order statistics, TeraSort
    // path), never approx_percentile's partition-dependent cut ──────────
    "q86_quantile_filter" -> ((s, dir) =>
      graft.text.Pipeline.filterByQuantile(
          s.read.parquet(t(dir, "documents")), "n_chars", num = 7, den = 10)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")),

    // ── per-group exact-quantile filter: keep each LANGUAGE's docs
    // at/above its own 7/10 n_chars quantile — the per-domain quality
    // cut (one global threshold would let verbose languages crowd out
    // terse ones); windows partitioned by lang, thresholds joined back ──
    "q87_quantile_per_group" -> ((s, dir) =>
      graft.text.Pipeline.filterByQuantilePerGroup(
          s.read.parquet(t(dir, "documents")), "n_chars", "lang", num = 7, den = 10)
        .select(col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy("doc_id")),

    // ── IVFADC + exact rerank (Jégou et al. ICASSP 2011): the composed
    // billion-vector search path, fully oracle-replayed — coarse L2
    // centroids (md5-ordered seed sample both engines compute), residual
    // PQ codebooks, per-cell ADC over the probed cells only, then exact
    // integer rerank of the 4k shortlist. Every distance is an exact
    // BIGINT; the md5 seedOrder is the one construction knob a foreign
    // engine needs to replay seed CHOICE (everything downstream is
    // deterministic integer arithmetic). Queries/candidates follow q22 ───
    "q88_ivfadc_rerank" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      graft.embed.Pq.ivfTopkAdcRerank(
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5),
        k = 10, nCells = 8, nProbe = 3, m = 8, kCodes = 16,
        rerankFactor = 4,
        seedOrder = md5(col("vec_id").cast(StringType).cast(BinaryType)))
    }),

    // ── IVF cosine top-k, fully oracle-replayed: md5-ordered centroid
    // sample (q88's seed convention), max-cosine cell assignment, top-3
    // cell probes, exact cosine rerank of the probed cells only — the
    // q22 integer-cosine score (floor(1e6·dot/√(qn·cn)), proven
    // engine-identical there) at every step. Completes the IVF family's
    // oracle coverage: q88 gates the residual-ADC composition, this
    // gates the plain inverted-file cosine path ─────────────────────────
    "q89_ivf_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      Similarity.ivfTopkCosine(
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5),
        k = 10, nCells = 8, nProbe = 3,
        seedOrder = md5(col("vec_id").cast(StringType).cast(BinaryType)))
    }),

    // ── end-to-end MinHash/LSH near-dedup, fully oracle-replayed: the
    // composition a pipeline user actually calls (shingle MinHash →
    // banded LSH candidates → exact-Jaccard verify of candidates only →
    // connected components). Every stage reuses an already-proven oracle
    // recipe: q19's affine minhash, q38's recursive-CTE components; the
    // banding/verify steps are plain SQL. The oracle's candidate volume
    // is LSH-bounded like the operator's — this is NOT a quadratic
    // replay ─────────────────────────────────────────────────────────────
    "q90_near_dedup" -> ((s, dir) =>
      graft.text.Dedup.nearDedup(
        s.read.parquet(t(dir, "documents")).select("doc_id", "text"))),

    // ── embedding-cosine near-dup clusters, fully oracle-replayed: the
    // vector analogue of q90 — deterministic hyperplane-LSH buckets
    // (fixed integer pseudo-random planes), 1-bit multiprobe candidate
    // pairs, exact integer-cosine verification (q22's score), connected
    // components. Threshold matches q54's 0.25; every stage is exact
    // integer/double arithmetic both engines reproduce, so even the
    // LSH's approximate RECALL is replayed bit-for-bit ───────────────────
    "q91_embed_near_dedup" -> ((s, dir) =>
      Similarity.embedNearDup(s.read.parquet(t(dir, "embeddings")),
        minScore1e6 = 250000L)),

    // ── multiprobe ANN top-k, fully oracle-replayed: q91's hyperplane
    // buckets, query-side 1-bit multiprobe, exact integer-cosine re-rank
    // of bucket candidates only, q22's score, bounded-heap top-k. With
    // q89/q91 this closes the last spec-only similarity surface — the
    // whole ANN family is now hash-gated ────────────────────────────────
    "q92_ann_topk" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      Similarity.annTopkCosine(
        emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), k = 10)
    }),

    // ── BM25-shaped lexical retrieval: top-10 docs per query, integer
    // BM25 (log-free Robertson idf surrogate, permille saturation —
    // Retrieval scaladoc). Queries are fixed literals over the corpus
    // vocabulary; the oracle replays the identical integer arithmetic ────
    "q83_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val queries = Seq(
        ("q1", "table scan filter"),
        ("q2", "stream window agg group"),
        ("q3", "customer query vector the")).toDF("q_id", "qtext")
      graft.text.Retrieval.bm25TopK(
        s.read.parquet(t(dir, "documents")), queries, k = 10)
    }),

    // ── corpus n-gram statistics: LM counts, tf/df terms, skip-grams ─────
    "q48_bigrams" -> ((s, dir) =>
      graft.text.Ngrams.topBigrams(s.read.parquet(t(dir, "documents")), k = 3)),

    "q49_tfdf_terms" -> ((s, dir) =>
      graft.text.Ngrams.topTermByTfDf(s.read.parquet(t(dir, "documents")))),

    "q50_skipgrams" -> ((s, dir) =>
      graft.text.Ngrams.skipgramPairs(s.read.parquet(t(dir, "documents")), radius = 2, k = 50)),

    // ── bucketed point-in-interval range join: events × overlapping
    // ±30-min windows around each active hour mark. The naive theta join
    // plans as BroadcastNestedLoopJoin; the operator turns it into an
    // equi-join on an hour bucket (one bucket per point, ≤2 per interval) ─
    "q52_range_join" -> ((s, dir) => {
      val HOUR = 3600L * 1000000
      val raw = s.read.parquet(t(dir, "events"))
      val ev = raw.select(col("event_id"), EventOps.tsMicros(raw).as("tus"))
      val wins = ev.select(expr(s"CAST(tus div $HOUR AS BIGINT)").as("hr")).distinct()
        .select(col("hr"), (col("hr") * HOUR - HOUR / 2).as("w_start"),
          (col("hr") * HOUR + HOUR / 2).as("w_end"))
      graft.events.RangeJoin.pointInInterval(ev, "tus", wins, "w_start", "w_end", HOUR)
        .select("event_id", "tus", "hr")
        .orderBy("event_id", "hr")
    }),

    // ── inverted-index postings: term → df + sorted posting list (elided
    // above df 50 — a stopword's posting list is the corpus itself) ──────
    "q53_postings" -> ((s, dir) =>
      graft.text.Ngrams.postings(s.read.parquet(t(dir, "documents")), maxDf = 50)),

    // ── n_chars histogram: exact integer bucketing ───────────────────────
    "q43_histogram" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .groupBy(expr("CAST(n_chars div 100 AS BIGINT)").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("bucket")),

    // ── arbitrary GROUPING SETS (beyond rollup q16 / cube q31) ───────────
    "q42_grouping_sets" -> ((s, dir) => {
      s.read.parquet(t(dir, "orders")).createOrReplaceTempView("orders_v")
      s.sql(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               |  CAST(SUM(${CENTS.format("o_totalprice")}) AS BIGINT) AS rev_c
               |FROM orders_v
               |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
               |                        (o_orderstatus, o_orderpriority))
               |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    }),

    // ── as-of join: each purchase ← most recent prior click, per user ────
    "q37_asof" -> ((s, dir) => {
      val raw = s.read.parquet(t(dir, "events"))
      val ev = raw.select(col("event_id"), col("user_id"),
          EventOps.tsMicros(raw).as("tus"), col("event_type"))
      AsOf.backward(
          ev.filter(col("event_type") === "purchase").drop("event_type"),
          ev.filter(col("event_type") === "click").drop("event_type"),
          partitionCols = Seq("user_id"), timeCol = "tus",
          leftTie = "event_id", rightTie = "event_id",
          payloadCols = Seq("event_id", "tus"))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("asof.event_id").as("click_id"), col("asof.tus").as("click_tus"))
        .orderBy("event_id")
    }),

    // ── stream-STREAM interval join, batch mode: each click attributed to
    // every same-user purchase within 1 day after it. Exercises the exact
    // code path the streaming attribution query runs (Spark unifies the
    // APIs; the watermark is a no-op on bounded input) — the equi-key +
    // bounded-time condition is what lets the streaming form evict state,
    // and in batch it plans as a plain shuffled equi-join on user ─────────
    "q93_interval_join" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
      def side(typ: String) = {
        val f = raw.filter(col("event_type") === typ)
        f.select(col("event_id").as("eventId"), col("user_id").as("userId"),
            EventOps.tsMicros(f).as("tsUs"), cents(col("value")).as("valueCents"))
          .as[graft.streaming.EventStreaming.Event]
      }
      graft.streaming.EventStreaming.intervalJoin(
          side("click"), side("purchase"), horizonSec = 86400, watermarkSec = 0)
        .select(col("l_id"), col("l_user").as("user_id"),
          unix_micros(col("l_ts")).as("l_tus"), col("l_cents"),
          col("r_id"), unix_micros(col("r_ts")).as("r_tus"), col("r_cents"))
        .orderBy("l_id", "r_id")
    }),

    // ── the left-outer form of q93: clicks with NO purchase in the horizon
    // survive with null right columns (the "unattributed impression" row
    // the streaming form emits once the watermark passes). Row order needs
    // NULLS FIRST on r_id in BOTH engines (Spark's ASC default; DuckDB
    // defaults NULLS LAST) ───────────────────────────────────────────────
    "q95_interval_join_outer" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
      def side(typ: String) = {
        val f = raw.filter(col("event_type") === typ)
        f.select(col("event_id").as("eventId"), col("user_id").as("userId"),
            EventOps.tsMicros(f).as("tsUs"), cents(col("value")).as("valueCents"))
          .as[graft.streaming.EventStreaming.Event]
      }
      graft.streaming.EventStreaming.intervalJoin(
          side("click"), side("purchase"), horizonSec = 86400, watermarkSec = 0,
          leftOuter = true)
        .select(col("l_id"), col("l_user").as("user_id"),
          unix_micros(col("l_ts")).as("l_tus"), col("l_cents"),
          col("r_id"), unix_micros(col("r_ts")).as("r_tus"), col("r_cents"))
        .orderBy(col("l_id"), col("r_id").asc_nulls_first)
    }),

    // ── grouped COUNT(DISTINCT): the two-phase shape (partial distinct on
    // (group, key), then count per group — Spark plans Expand + two
    // HashAggregates, map-side combined both times). The exact form is the
    // oracle gate; the 100 TB path for ultra-high-cardinality keys is
    // approx_count_distinct (HLL++, one pass, fixed memory), error-bounded
    // against this exact result in ApproxDistinctSpec ────────────────────
    "q96_distinct_users" -> ((s, dir) =>
      s.read.parquet(t(dir, "events"))
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // ── stream-static enrichment, batch mode: the event stream joined to a
    // bounded dimension snapshot (customer attributes keyed by user id).
    // The dim is broadcast — per micro-batch in streaming, once here; left
    // join keeps unmatched events with null attributes ───────────────────
    "q94_enrich" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      val dim = s.read.parquet(t(dir, "customer"))
        .select(col("c_custkey").as("userId"), col("c_mktsegment"),
          col("c_nationkey").cast(LongType).as("nation_key"))
      graft.streaming.EventStreaming.enrich(evts, dim, "userId", left = true)
        .select(col("eventId").as("event_id"), col("userId").as("user_id"),
          col("c_mktsegment"), col("nation_key"))
        .orderBy("event_id")
    }),

    // ── the STATEFUL streaming sessionization path itself (q29 gates only
    // the batch twin): the bounded events slice replays through
    // flatMapGroupsWithState via MemoryStream, a sentinel-advanced
    // watermark seals every session, and the sealed sessions must match
    // the oracle's gap-sessionization SQL cell-exactly. A deterministic
    // user slice (every 8th user): the gate proves the STATE PATH, and a
    // replay harness re-persists the whole state per micro-batch — full
    // sf0.1 there is bench weight without extra evidence (the operator's
    // scale story is the state store + watermark eviction, not the replay)
    "q97_stream_sessions" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("user_id") % 8 === 0)
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.sessionizeReplay(evts, gapSec = 1800)
        .toDF()
        .select(col("userId").as("user_id"),
          col("sessionStartUs").as("session_start_us"),
          col("sessionEndUs").as("session_end_us"),
          col("nEvents").as("n_events"), col("sumCents").as("sum_cents"))
        .orderBy("user_id", "session_start_us")
    }),

    // ── the NATIVE session-window aggregate (Spark's session_window —
    // codegen'd groupBy, state-store-backed in streaming): the scale path
    // for per-session aggregates, vs q97's explicit-state form. Batch
    // mode over the full events table; boundary: adjacent session ranges
    // MERGE, so splits are `diff > gap` — same as q29/q97 (spec-pinned) ──
    "q99_session_window" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming
        .sessionWindowAgg(evts, gapSec = 1800, watermarkSec = 0)
        .orderBy("user_id", "session_start_us")
    }),

    // ── character-level near-dup: Levenshtein-scored pairs under
    // (first-token, token-count) blocking — the Jaccard blind-spot
    // complement (typo/OCR dups whose word sets diverge). Equi-join on
    // the block key, codegen'd levenshtein on blocked candidates only ────
    "q100_edit_distance" -> ((s, dir) =>
      Dedup.editDistancePairs(s.read.parquet(t(dir, "documents")))),

    // ── ordered conversion funnel (view → click → purchase): earliest
    // stage-k event strictly after the user's stage-(k-1) time; one
    // filtered agg per stage + one co-partitioned user join per
    // transition ─────────────────────────────────────────────────────────
    "q101_funnel" -> ((s, dir) =>
      EventOps.funnel(s.read.parquet(t(dir, "events")),
        Seq("view", "click", "purchase"))),

    // ── cohort retention triangle: users bucketed by first-activity week,
    // distinct-active counts per (cohort, week offset) ───────────────────
    "q102_retention" -> ((s, dir) =>
      EventOps.retention(s.read.parquet(t(dir, "events")))),

    // ── behavioral transition matrix: consecutive event-type pairs per
    // user (one partitioned lead window, O(#types²) output) ──────────────
    "q103_transitions" -> ((s, dir) =>
      EventOps.transitions(s.read.parquet(t(dir, "events")))),

    // ── snapshot diff via full-outer join: two deterministic "extracts"
    // of orders (old drops key%5=0; new drops key%7=0 and bumps
    // o_totalprice on key%3=0) — added/removed/changed against an oracle
    // that derives the statuses independently from the key arithmetic ────
    "q104_snapshot_diff" -> ((s, dir) => {
      val o = s.read.parquet(t(dir, "orders"))
      val old = o.filter(col("o_orderkey") % 5 =!= 0)
      val nw = o.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.operators.TableOps.snapshotDiff(old, nw, "o_orderkey")
    }),

    // ── hourly trending: top-3 event types per hour bucket (rank window
    // over the tiny count table, never over raw events) ──────────────────
    "q105_trending" -> ((s, dir) =>
      EventOps.trending(s.read.parquet(t(dir, "events")))),

    // ── SCD Type-2 intervals from the event log: collapse consecutive
    // same-state events per user, emit (state, valid_from, valid_to)
    // validity intervals — the CDC→dimension warehouse primitive ─────────
    "q106_scd2" -> ((s, dir) =>
      EventOps.scd2(s.read.parquet(t(dir, "events")))),

    // ── bloom-prefiltered semi join: lineitem rows of high-value orders;
    // the key side is sketched (BloomFilterAggregate), the sketch filters
    // fact rows BEFORE the exchange, an exact semi join removes false
    // positives — result ≡ the plain semi join the oracle runs ───────────
    "q107_bloom_semijoin" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
      val hot = s.read.parquet(t(dir, "orders"))
        .filter(col("o_totalprice") > 400000.0)
      // sketch sized to the key side (~tens of thousands of hot orders):
      // 2^20 bits = 128 KiB, FP ≲ 1% — the corrective join stays cheap
      graft.operators.BloomJoin.semiJoin(li, "l_orderkey", hot, "o_orderkey",
        expectedItems = 1L << 16, numBits = 1L << 20)
        .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
          cents(col("l_extendedprice")).as("price_c"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ── per-user ordered behavior path (first 20 events) + total count:
    // rank/total in one user window, collect bounded at 20/user ──────────
    "q108_user_paths" -> ((s, dir) =>
      EventOps.userPaths(s.read.parquet(t(dir, "events")))),

    // ── half-life-decayed engagement score: integer permille weights
    // (1000 >> age_days, exact cross-engine), one keyed aggregation ──────
    "q109_decayed_score" -> ((s, dir) =>
      EventOps.decayedScore(s.read.parquet(t(dir, "events")))),

    // ── mode event type per user: window-free two-phase argmin on the
    // composite (-n, value) struct, deterministic tie-break ──────────────
    "q110_mode" -> ((s, dir) =>
      graft.operators.TableOps.modePerGroup(
        s.read.parquet(t(dir, "events")), "user_id", "event_type")),

    // ── PageRank (3 synchronous rounds) over the bidirectional
    // part↔supplier co-occurrence graph; exact fixed-point ppm arithmetic
    // so DuckDB replays every iteration cell-for-cell ────────────────────
    "q111_pagerank" -> ((s, dir) => {
      // spread the single-split scan before the edge distinct
      // (r15 optimization round; no-op at scale)
      val li = graft.text.TextOps.spreadScan(
        s.read.parquet(t(dir, "lineitem")), "l_orderkey")
      val e0 = li.select((col("l_partkey") * 2).cast(LongType).as("s"),
        (col("l_suppkey") * 2 + 1).cast(LongType).as("d")).distinct()
      val edges = e0.union(e0.select(col("d").as("s"), col("s").as("d")))
      graft.graph.PageRank.pageRank(edges, "s", "d", iterations = 3)
        .select(col("node"), col("rank").as("pr"))
    }),

    // ── hourly resample with gap-fill + forward fill: densify each event
    // type onto the full bucket grid, carry the last observed sum across
    // the gaps — raw events meet only one map-side-combined agg ──────────
    "q112_resample" -> ((s, dir) =>
      EventOps.resample(s.read.parquet(t(dir, "events")))),

    // ── fixed-width price histogram ($5000 bins over price cents): one
    // map-side-combined aggregation, O(#bins) exchange ───────────────────
    "q113_histogram" -> ((s, dir) => {
      val v = s.read.parquet(t(dir, "lineitem"))
        .select(cents(col("l_extendedprice")).as("price_c"))
      graft.operators.TableOps.histogram(v, "price_c", binWidth = 500000L)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    "q76_salted_join" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin,

    // the hot-keys variant is result-identical to the SAME plain join
    "q78_salted_hot_join" ->
      """SELECT o.o_orderkey, o.o_custkey,
        |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin,

    // same exact-group-by family as q72, with the threshold inside the
    // frequency distribution so the qualify/reject boundary discriminates
    "q79_heavy_hitters_low" ->
      """WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT term, count(*) AS cnt FROM t GROUP BY term
        |HAVING count(*) >= GREATEST(1, (SELECT n // 32 FROM n))
        |ORDER BY term""".stripMargin,

    // mirrors takePerGroup: k smallest salted hashes per group, the same
    // 'cap' || chr(1) || key md5 recipe as the q55/q64/q75 family; the
    // window here is the ORACLE's formulation — the operator itself never
    // plans a per-group window
    "q80_cap_per_group" ->
      """WITH h AS (SELECT doc_id, lang,
        |    ('0x' || substr(md5('cap' || chr(1) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hk
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
        |      FROM h)
        |SELECT doc_id, lang FROM r
        |WHERE rn <= CASE WHEN lang = 'zh' THEN 20 ELSE 70 END
        |ORDER BY doc_id""".stripMargin,

    // mirrors Dedup.removeDuplicatedSpans: keep-first on global
    // (doc_id, position) order, later occurrences cover [p, p+7], a doc's
    // text is its surviving tokens in position order. ANTI JOIN mirrors the
    // Spark left_anti (covered-side overlap duplicates are harmless in
    // both engines, so neither side needs a DISTINCT).
    "q81_dedup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents),
        |occ AS (SELECT doc_id, i, array_to_string(ws[i:i+7], ' ') AS g
        |        FROM toks, UNNEST(range(1, len(ws) - 6)) AS t(i)),
        |r AS (SELECT doc_id, i,
        |        count(*) OVER (PARTITION BY g) AS tot,
        |        row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn
        |      FROM occ),
        |cov AS (SELECT doc_id, c.pos FROM r, UNNEST(range(i, i + 8)) AS c(pos)
        |        WHERE tot > 1 AND rn > 1),
        |tok AS (SELECT doc_id, UNNEST(ws) AS tok,
        |          UNNEST(range(1, len(ws) + 1)) AS pos
        |        FROM toks),
        |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t
        |         ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |          CAST(count(*) AS BIGINT) AS n_kept
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
        |       CAST(len(string_split(coalesce(d.text, ''), ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(string_split(coalesce(d.text, ''), ' ')) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.scoreHashedLinear with the gate's arithmetic
    // weights table inlined: bucket = xhash(token) % 4096,
    // w = bucket % 2001 - 1000, logit = sum over tokens (bias 0),
    // keep = logit >= 0
    "q82_quality_linear" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(coalesce(text, ''), ' ')) AS w
        |            FROM documents),
        |b AS (SELECT doc_id,
        |        (('0x' || substr(md5(w), 1, 15))::BIGINT % 4096) AS bucket
        |      FROM tok),
        |s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(sum((bucket % 2001) - 1000) AS BIGINT) AS logit_permille
        |      FROM b GROUP BY doc_id)
        |SELECT doc_id, n_tokens, logit_permille,
        |       CAST(CASE WHEN logit_permille >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    // mirrors Pq.seedCodebooks + encode + topkAdc: quantized grid
    // (floor(x*1000), q22's recipe — integer values, exact in doubles),
    // codebook = the 16 lowest-vec_id candidates' subvectors, encode =
    // argmin squared L2 via 2·dot − |c|² (ties to the smallest code),
    // adist = Σ_sub (|q_sub|² + |c|² − 2·q_sub·c), rank by (adist, cand_id)
    "q84_pq_adc" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |seeds AS (SELECT vd, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
        |          FROM e WHERE vec_id >= 5 ORDER BY vec_id LIMIT 16),
        |cbn AS (SELECT t.sub, code, vd[(t.sub*8+1):(t.sub*8+8)] AS cv,
        |          CAST(list_dot_product(vd[(t.sub*8+1):(t.sub*8+8)],
        |                                vd[(t.sub*8+1):(t.sub*8+8)]) AS BIGINT) AS cn
        |        FROM seeds, UNNEST(range(0, 8)) AS t(sub)),
        |cs AS (SELECT vec_id AS cand_id, t.sub, vd[(t.sub*8+1):(t.sub*8+8)] AS sv
        |       FROM e, UNNEST(range(0, 8)) AS t(sub) WHERE vec_id >= 5),
        |enc AS (SELECT cand_id, sub, code FROM (
        |          SELECT cs.cand_id, cs.sub, cbn.code,
        |            row_number() OVER (PARTITION BY cs.cand_id, cs.sub
        |              ORDER BY CAST(2 * list_dot_product(cs.sv, cbn.cv) AS BIGINT) - cbn.cn DESC,
        |                       cbn.code) AS arn
        |          FROM cs JOIN cbn USING (sub)) WHERE arn = 1),
        |qs AS (SELECT vec_id AS q_id, t.sub, vd[(t.sub*8+1):(t.sub*8+8)] AS sv
        |       FROM e, UNNEST(range(0, 8)) AS t(sub) WHERE vec_id < 5),
        |lut AS (SELECT q_id, sub, code,
        |          CAST(list_dot_product(qs.sv, qs.sv) AS BIGINT) + cbn.cn
        |          - CAST(2 * list_dot_product(qs.sv, cbn.cv) AS BIGINT) AS pd
        |        FROM qs JOIN cbn USING (sub)),
        |sc AS (SELECT q_id, cand_id, CAST(sum(pd) AS BIGINT) AS adist
        |       FROM enc JOIN lut USING (sub, code) GROUP BY q_id, cand_id)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY adist, cand_id) AS BIGINT) AS rn,
        |  cand_id, adist
        |FROM sc QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin,

    // mirrors Dedup.exactBest: q18's fingerprint, survivor = argmax
    // (n_chars, then smallest doc_id) per group — DESC NULLS LAST matches
    // Spark's struct-ordering max_by (NULL score loses to any scored row)
    "q85_dedup_best" ->
      """WITH f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS s,
        |    array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp
        |  FROM documents),
        |r AS (SELECT doc_id, fp,
        |    row_number() OVER (PARTITION BY fp
        |      ORDER BY s DESC NULLS LAST, doc_id) AS rn
        |  FROM f),
        |g AS (SELECT fp, MAX(s) AS best_score, COUNT(*) AS dup_cnt
        |      FROM f GROUP BY fp)
        |SELECT r.doc_id AS rep_doc, g.best_score, g.dup_cnt
        |FROM r JOIN g USING (fp) WHERE rn = 1 ORDER BY rep_doc""".stripMargin,

    // mirrors Pipeline.filterByQuantile: threshold = element at 0-indexed
    // rank floor(7·n/10) of non-NULL n_chars ascending (exactSplitters'
    // rank convention), then score >= threshold
    "q86_quantile_filter" ->
      """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
        |           WHERE n_chars IS NOT NULL),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS rk FROM s),
        |n AS (SELECT COUNT(*) AS n FROM s),
        |thr AS (SELECT v FROM r, n WHERE r.rk = (7 * n.n) // 10)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        |FROM documents WHERE n_chars >= (SELECT v FROM thr)
        |ORDER BY doc_id""".stripMargin,

    // mirrors Pipeline.filterByQuantilePerGroup: per-lang threshold =
    // element at 0-indexed rank floor(7·n_g/10) of the group's non-NULL
    // n_chars ascending; null-safe group join like Spark's <=>
    "q87_quantile_per_group" ->
      """WITH s AS (SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents
        |           WHERE n_chars IS NOT NULL),
        |r AS (SELECT lang, v,
        |        row_number() OVER (PARTITION BY lang ORDER BY v) - 1 AS rk,
        |        count(*) OVER (PARTITION BY lang) AS n
        |      FROM s),
        |thr AS (SELECT lang, v AS t FROM r WHERE rk = (7 * n) // 10)
        |SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
        |FROM documents d JOIN thr ON d.lang IS NOT DISTINCT FROM thr.lang
        |WHERE d.n_chars >= thr.t
        |ORDER BY doc_id""".stripMargin,

    // mirrors Pq.ivfTopkAdcRerank end-to-end: quantized grid (q84's
    // recipe), coarse centroids = the 8 candidates ranked first by
    // (md5(vec_id::VARCHAR), vec_id) with cell ids assigned in vec_id
    // order (seedCodebooks' convention), cell assignment = argmax
    // (2·dot − |c|²) ties-to-smallest, residual = v − centroid[cell],
    // residual PQ codebook = 16 md5-ranked residuals sliced into 8
    // subspaces, encode = per-(vec,sub) argmin, query probes = top-3
    // cells, LUT pd = |q_sub|² + |c|² − 2·q_sub·c per probed cell, ADC
    // shortlist = top-40 by (Σpd, cand_id), exact rerank dist =
    // |q|² + |c|² − 2·q·c, final rank by (dist, cand_id). All values on
    // the integer grid — every comparison is over exact BIGINTs
    "q88_ivfadc_rerank" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |cand AS (SELECT vec_id, vd FROM e WHERE vec_id >= 5),
        |qv AS (SELECT vec_id, vd FROM e WHERE vec_id < 5),
        |cseed AS (SELECT vd, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
        |          FROM (SELECT vec_id, vd FROM cand
        |                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
        |cents AS (SELECT cell, vd AS cv,
        |            CAST(list_dot_product(vd, vd) AS BIGINT) AS cn FROM cseed),
        |asg AS (SELECT vec_id, cell FROM (
        |          SELECT c.vec_id, ct.cell,
        |            row_number() OVER (PARTITION BY c.vec_id
        |              ORDER BY CAST(2 * list_dot_product(c.vd, ct.cv) AS BIGINT) - ct.cn DESC,
        |                       ct.cell) AS rn
        |          FROM cand c, cents ct) WHERE rn = 1),
        |res AS (SELECT a.vec_id, a.cell,
        |          list_transform(range(1, 65), i -> c.vd[i] - ct.cv[i]) AS rv
        |        FROM asg a JOIN cand c USING (vec_id) JOIN cents ct USING (cell)),
        |pseed AS (SELECT rv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
        |          FROM (SELECT vec_id, rv FROM res
        |                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
        |pcb AS (SELECT t.sub, code, rv[(t.sub*8+1):(t.sub*8+8)] AS cv,
        |          CAST(list_dot_product(rv[(t.sub*8+1):(t.sub*8+8)],
        |                                rv[(t.sub*8+1):(t.sub*8+8)]) AS BIGINT) AS cn
        |        FROM pseed, UNNEST(range(0, 8)) AS t(sub)),
        |rs AS (SELECT vec_id AS cand_id, cell, t.sub,
        |         rv[(t.sub*8+1):(t.sub*8+8)] AS sv
        |       FROM res, UNNEST(range(0, 8)) AS t(sub)),
        |enc AS (SELECT cand_id, cell, sub, code FROM (
        |          SELECT rs.cand_id, rs.cell, rs.sub, pcb.code,
        |            row_number() OVER (PARTITION BY rs.cand_id, rs.sub
        |              ORDER BY CAST(2 * list_dot_product(rs.sv, pcb.cv) AS BIGINT) - pcb.cn DESC,
        |                       pcb.code) AS arn
        |          FROM rs JOIN pcb USING (sub)) WHERE arn = 1),
        |probes AS (SELECT q_id, cell, qrv FROM (
        |            SELECT q.vec_id AS q_id, ct.cell,
        |              list_transform(range(1, 65), i -> q.vd[i] - ct.cv[i]) AS qrv,
        |              row_number() OVER (PARTITION BY q.vec_id
        |                ORDER BY CAST(2 * list_dot_product(q.vd, ct.cv) AS BIGINT) - ct.cn DESC,
        |                         ct.cell) AS pr
        |            FROM qv q, cents ct) WHERE pr <= 3),
        |ql AS (SELECT q_id, cell, t.sub, qrv[(t.sub*8+1):(t.sub*8+8)] AS sv
        |       FROM probes, UNNEST(range(0, 8)) AS t(sub)),
        |lut AS (SELECT q_id, cell, sub, code,
        |          CAST(list_dot_product(ql.sv, ql.sv) AS BIGINT) + pcb.cn
        |          - CAST(2 * list_dot_product(ql.sv, pcb.cv) AS BIGINT) AS pd
        |        FROM ql JOIN pcb USING (sub)),
        |sc AS (SELECT q_id, cand_id, CAST(sum(pd) AS BIGINT) AS adist
        |       FROM enc JOIN lut USING (cell, sub, code) GROUP BY q_id, cand_id),
        |short AS (SELECT q_id, cand_id FROM (
        |           SELECT q_id, cand_id,
        |             row_number() OVER (PARTITION BY q_id ORDER BY adist, cand_id) AS srn
        |           FROM sc) WHERE srn <= 40),
        |ex AS (SELECT s.q_id, s.cand_id,
        |         CAST(list_dot_product(q.vd, q.vd) AS BIGINT)
        |         + CAST(list_dot_product(c.vd, c.vd) AS BIGINT)
        |         - CAST(2 * list_dot_product(q.vd, c.vd) AS BIGINT) AS dist
        |       FROM short s JOIN qv q ON s.q_id = q.vec_id
        |            JOIN cand c ON s.cand_id = c.vec_id)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist, cand_id) AS BIGINT) AS rn,
        |  cand_id, dist
        |FROM ex QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin,

    // mirrors Similarity.ivfTopkCosine: q88's md5 seed convention for
    // the 8 centroids (cell ids by vec_id order among the sample), cell
    // assignment and probes by the q22 cosine score (NULLS LAST desc
    // ties-to-smallest — identical to Spark's coalesce-to-MinValue
    // max_by), exact rerank over probed cells, final rank by
    // (score desc, cand_id)
    "q89_ivf_cosine" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |cand AS (SELECT vec_id, vd,
        |           CAST(list_dot_product(vd, vd) AS BIGINT) AS n2 FROM e
        |         WHERE vec_id >= 5),
        |qv AS (SELECT vec_id, vd,
        |         CAST(list_dot_product(vd, vd) AS BIGINT) AS n2 FROM e
        |       WHERE vec_id < 5),
        |cseed AS (SELECT vd, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
        |          FROM (SELECT vec_id, vd FROM cand
        |                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
        |cents AS (SELECT cell, vd AS cv,
        |            CAST(list_dot_product(vd, vd) AS BIGINT) AS cn FROM cseed),
        |asg AS (SELECT cand_id, cell FROM (
        |          SELECT c.vec_id AS cand_id, ct.cell,
        |            row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |              CASE WHEN c.n2 = 0 OR ct.cn = 0 THEN NULL
        |              ELSE CAST(FLOOR(1000000.0 * CAST(CAST(list_dot_product(c.vd, ct.cv) AS BIGINT) AS DOUBLE)
        |                   / sqrt(CAST(c.n2 AS DOUBLE) * CAST(ct.cn AS DOUBLE))) AS BIGINT) END
        |              DESC NULLS LAST, ct.cell) AS rn
        |          FROM cand c, cents ct) WHERE rn = 1),
        |probes AS (SELECT q_id, cell FROM (
        |            SELECT q.vec_id AS q_id, ct.cell,
        |              row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |                CASE WHEN q.n2 = 0 OR ct.cn = 0 THEN NULL
        |                ELSE CAST(FLOOR(1000000.0 * CAST(CAST(list_dot_product(q.vd, ct.cv) AS BIGINT) AS DOUBLE)
        |                     / sqrt(CAST(q.n2 AS DOUBLE) * CAST(ct.cn AS DOUBLE))) AS BIGINT) END
        |                DESC NULLS LAST, ct.cell) AS pr
        |            FROM qv q, cents ct) WHERE pr <= 3),
        |sc AS (SELECT p.q_id, a.cand_id,
        |         CAST(FLOOR(1000000.0 * CAST(CAST(list_dot_product(q.vd, c.vd) AS BIGINT) AS DOUBLE)
        |              / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE))) AS BIGINT) AS score
        |       FROM probes p JOIN asg a USING (cell)
        |            JOIN qv q ON p.q_id = q.vec_id
        |            JOIN cand c ON a.cand_id = c.vec_id
        |       WHERE q.n2 != 0 AND c.n2 != 0)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, cand_id) AS BIGINT) AS rn,
        |  cand_id, score
        |FROM sc QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin,

    // mirrors Dedup.nearDedup end-to-end with defaults (16 hashes, 8
    // bands x 2 rows, verify at 4/5): q19's minhash recipe, band sig =
    // comma-joined minhashes in i order, bucket self-join (doc_a <
    // doc_b, distinct), exact word-set Jaccard verify, then q38's
    // recursive-CTE components seeded from ALL docs (sub-3-token and
    // NULL-text docs stay singletons)
    "q90_near_dedup" ->
      """WITH RECURSIVE
        |toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
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
        |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM bsig a JOIN bsig b
        |           ON a.band = b.band AND a.bs = b.bs AND a.doc_id < b.doc_id),
        |sets AS MATERIALIZED (SELECT doc_id, list_distinct(string_split(text, ' ')) AS st
        |         FROM documents),
        |ver AS MATERIALIZED (SELECT doc_a, doc_b FROM cand
        |        JOIN sets sa ON doc_a = sa.doc_id
        |        JOIN sets sb ON doc_b = sb.doc_id
        |        WHERE CAST(len(list_intersect(sa.st, sb.st)) AS BIGINT) * 5 >=
        |              CAST(len(sa.st) + len(sb.st)
        |                   - len(list_intersect(sa.st, sb.st)) AS BIGINT) * 4),
        |e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM ver
        |      UNION ALL SELECT doc_b, doc_a FROM ver),
        |reach(s, d) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.s, e.b FROM reach r JOIN e ON r.d = e.a)
        |SELECT s AS doc_id, MIN(d) AS cluster FROM reach GROUP BY s ORDER BY doc_id""".stripMargin,

    // mirrors Similarity.embedNearDup with defaults (12 planes, 1-bit
    // multiprobe, verify >= 0.25): plane j's component for dim d is
    // ((2654435761·(j+1) mod P)·d mod P) − P DIV 2 over the quantized
    // grid (exact in doubles: |term| <= 5e11, 64-dim sum <= 3.2e13 <
    // 2^53), bucket bit j = [projection > 0], candidates from
    // probe-XOR bucket equality, q22's cosine score, q38's
    // recursive-CTE components seeded from ALL vectors
    "q91_embed_near_dedup" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |planes AS (SELECT j, (2654435761 * (j+1)) % 1000000007 AS aj
        |           FROM (SELECT UNNEST(range(12)) AS j)),
        |proj AS (SELECT e.vec_id, p.j,
        |           SUM(e.vd[t.d] *
        |               CAST((p.aj * t.d) % 1000000007 - 500000003 AS DOUBLE)) AS pr
        |         FROM e, planes p, UNNEST(range(1, 65)) AS t(d)
        |         GROUP BY e.vec_id, p.j),
        |bk AS (SELECT vec_id,
        |         CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << j)
        |                  ELSE 0 END) AS BIGINT) AS bucket
        |       FROM proj GROUP BY vec_id),
        |flips AS (SELECT UNNEST(list_append(
        |            list_transform(range(12), j -> (CAST(1 AS BIGINT) << j)),
        |            CAST(0 AS BIGINT))) AS f),
        |cand AS (SELECT DISTINCT a.vec_id AS vid_a, b.vec_id AS vid_b
        |         FROM bk a, flips, bk b
        |         WHERE xor(a.bucket, flips.f) = b.bucket AND a.vec_id < b.vec_id),
        |ver AS (SELECT vid_a, vid_b FROM cand
        |        JOIN e a ON vid_a = a.vec_id JOIN e b ON vid_b = b.vec_id,
        |        LATERAL (SELECT CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS dot,
        |                   CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS qn,
        |                   CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS cn) s
        |        WHERE s.qn != 0 AND s.cn != 0
        |          AND CAST(FLOOR(1000000.0 * CAST(s.dot AS DOUBLE)
        |              / sqrt(CAST(s.qn AS DOUBLE) * CAST(s.cn AS DOUBLE))) AS BIGINT)
        |              >= 250000),
        |ed AS (SELECT vid_a AS a, vid_b AS b FROM ver
        |       UNION ALL SELECT vid_b, vid_a FROM ver),
        |reach(s, d) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT r.s, ed.b FROM reach r JOIN ed ON r.d = ed.a)
        |SELECT s AS vec_id, MIN(d) AS cluster FROM reach GROUP BY s ORDER BY vec_id""".stripMargin,

    // mirrors Similarity.annTopkCosine (12 planes, query-side 1-bit
    // multiprobe): q91's plane/bucket recipe over the whole table,
    // candidates = query probes meeting candidate buckets, q22's cosine
    // score, rank by (score desc, cand_id) capped at 10
    "q92_ann_topk" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |planes AS (SELECT j, (2654435761 * (j+1)) % 1000000007 AS aj
        |           FROM (SELECT UNNEST(range(12)) AS j)),
        |proj AS (SELECT e.vec_id, p.j,
        |           SUM(e.vd[t.d] *
        |               CAST((p.aj * t.d) % 1000000007 - 500000003 AS DOUBLE)) AS pr
        |         FROM e, planes p, UNNEST(range(1, 65)) AS t(d)
        |         GROUP BY e.vec_id, p.j),
        |bk AS (SELECT vec_id,
        |         CAST(SUM(CASE WHEN pr > 0 THEN (CAST(1 AS BIGINT) << j)
        |                  ELSE 0 END) AS BIGINT) AS bucket
        |       FROM proj GROUP BY vec_id),
        |flips AS (SELECT UNNEST(list_append(
        |            list_transform(range(12), j -> (CAST(1 AS BIGINT) << j)),
        |            CAST(0 AS BIGINT))) AS f),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS cand_id
        |         FROM bk q, flips, bk c
        |         WHERE q.vec_id < 5 AND c.vec_id >= 5
        |           AND xor(q.bucket, flips.f) = c.bucket),
        |sc AS (SELECT cand.q_id, cand.cand_id,
        |         CAST(FLOOR(1000000.0 * CAST(CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS DOUBLE)
        |              / sqrt(CAST(CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS DOUBLE)
        |                     * CAST(CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS DOUBLE))) AS BIGINT) AS score
        |       FROM cand JOIN e a ON cand.q_id = a.vec_id
        |            JOIN e b ON cand.cand_id = b.vec_id
        |       WHERE CAST(list_dot_product(a.vd, a.vd) AS BIGINT) != 0
        |         AND CAST(list_dot_product(b.vd, b.vd) AS BIGINT) != 0)
        |SELECT q_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, cand_id) AS BIGINT) AS rn,
        |  cand_id, score
        |FROM sc QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin,

    // mirrors Retrieval.bm25TopK: integer BM25 (log-free idf surrogate),
    // every floor division in the same order as the Spark plan; ties
    // break (score desc, doc_id)
    "q83_bm25_topk" ->
      """WITH q(q_id, qtext) AS (VALUES
        |  ('q1', 'table scan filter'),
        |  ('q2', 'stream window agg group'),
        |  ('q3', 'customer query vector the')),
        |qt AS (SELECT q_id, UNNEST(list_distinct(string_split(qtext, ' '))) AS term FROM q),
        |dict AS (SELECT DISTINCT term FROM qt),
        |lens AS (SELECT doc_id,
        |           CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS len
        |         FROM documents),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST((1000 * sum(len)) // count(*) AS BIGINT) AS avg1000
        |       FROM lens),
        |tok AS (SELECT doc_id, UNNEST(string_split(coalesce(text, ''), ' ')) AS term
        |        FROM documents),
        |m AS (SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
        |      FROM tok t JOIN dict USING (term) GROUP BY t.doc_id, t.term),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM m GROUP BY term),
        |sc AS (SELECT qt.q_id, m.doc_id,
        |         CAST(sum(
        |           (((1000 * (st.n - dft.df)) // (dft.df + 1)) * m.tf * (1200 + 1000))
        |           // (m.tf * 1000 + ((1200 * (1000 - 750 + ((750 * l.len * 1000) // st.avg1000))) // 1000))
        |         ) AS BIGINT) AS score1000
        |       FROM m JOIN dft USING (term) JOIN qt USING (term)
        |            JOIN lens l USING (doc_id), st
        |       GROUP BY qt.q_id, m.doc_id),
        |r AS (SELECT q_id, doc_id, score1000,
        |        row_number() OVER (PARTITION BY q_id ORDER BY score1000 DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id, score1000
        |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "q48_bigrams" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |      FROM toks, UNNEST(range(1, len(ws))) AS t(i)
        |      WHERE len(ws) >= 2),
        |c AS (SELECT w1, w2, COUNT(*) AS cnt FROM p GROUP BY w1, w2)
        |SELECT w1, w2, cnt,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY w1 ORDER BY cnt DESC, w2) AS BIGINT) AS rn
        |FROM c QUALIFY rn <= 3 ORDER BY w1, rn""".stripMargin,

    "q49_tfdf_terms" ->
      """WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, w FROM tok) GROUP BY w),
        |s AS (SELECT tf.doc_id, tf.w, tf.tf, df.df,
        |        CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score,
        |        ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf * 1000000 // df.df DESC, tf.w) AS rn
        |      FROM tf JOIN df USING (w))
        |SELECT doc_id, w AS term, tf, df, score FROM s WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q50_skipgrams" ->
      """WITH pos AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w
        |             FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |                  UNNEST(range(1, len(ws) + 1)) AS t(i))
        |SELECT a.w AS w1, b.w AS w2, COUNT(*) AS cnt
        |FROM pos a JOIN pos b
        |  ON a.doc_id = b.doc_id AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
        | AND a.pos <> b.pos
        |GROUP BY a.w, b.w ORDER BY cnt DESC, w1, w2 LIMIT 50""".stripMargin,

    "q52_range_join" ->
      """WITH ev AS (SELECT event_id, epoch_us(ts) AS tus FROM events),
        |w AS (SELECT DISTINCT tus // 3600000000 AS hr FROM ev),
        |wi AS (SELECT hr, hr * 3600000000 - 1800000000 AS ws,
        |              hr * 3600000000 + 1800000000 AS we FROM w)
        |SELECT event_id, tus, hr FROM ev JOIN wi ON tus >= ws AND tus <= we
        |ORDER BY event_id, hr""".stripMargin,

    "q53_postings" ->
      """SELECT w AS term, COUNT(*) AS df,
        |  CASE WHEN COUNT(*) <= 50
        |       THEN string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) END AS postings
        |FROM (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY term""".stripMargin,

    "q43_histogram" ->
      """SELECT n_chars // 100 AS bucket, COUNT(*) AS n_docs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q42_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
         |  CAST(SUM(${CENTS.format("o_totalprice")}) AS BIGINT) AS rev_c
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
         |                        (o_orderstatus, o_orderpriority))
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q37_asof" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type FROM events),
        |u AS (
        |  SELECT user_id, tus, event_id, 0 AS tag,
        |         event_id AS p_id, tus AS p_tus FROM ev WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, tus, event_id, 1 AS tag,
        |         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM ev WHERE event_type = 'purchase'),
        |m AS (SELECT user_id, tus, event_id, tag,
        |        last_value(p_id IGNORE NULLS) OVER w AS click_id,
        |        last_value(p_tus IGNORE NULLS) OVER w AS click_tus
        |      FROM u
        |      WINDOW w AS (PARTITION BY user_id ORDER BY tus, tag, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, tus, click_id, click_tus
        |FROM m WHERE tag = 1 ORDER BY event_id""".stripMargin,

    "q93_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v, event_type
        |            FROM events),
        |l AS (SELECT * FROM ev WHERE event_type = 'click'),
        |r AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT l.event_id AS l_id, l.user_id AS user_id, l.tus AS l_tus,
        |       l.v AS l_cents, r.event_id AS r_id, r.tus AS r_tus,
        |       r.v AS r_cents
        |FROM l JOIN r ON l.user_id = r.user_id
        |  AND r.tus >= l.tus AND r.tus <= l.tus + 86400000000
        |ORDER BY l_id, r_id""".stripMargin,

    "q95_interval_join_outer" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v, event_type
        |            FROM events),
        |l AS (SELECT * FROM ev WHERE event_type = 'click'),
        |r AS (SELECT * FROM ev WHERE event_type = 'purchase')
        |SELECT l.event_id AS l_id, l.user_id AS user_id, l.tus AS l_tus,
        |       l.v AS l_cents, r.event_id AS r_id, r.tus AS r_tus,
        |       r.v AS r_cents
        |FROM l LEFT JOIN r ON l.user_id = r.user_id
        |  AND r.tus >= l.tus AND r.tus <= l.tus + 86400000000
        |ORDER BY l_id, r_id NULLS FIRST""".stripMargin,

    "q96_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q94_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment,
        |       CAST(c.c_nationkey AS BIGINT) AS nation_key
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q97_stream_sessions" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events
        |            WHERE user_id % 8 = 0),
        |g AS (SELECT user_id, tus, v,
        |        CASE WHEN LAG(tus) OVER w IS NULL
        |               OR tus - LAG(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |s AS (SELECT user_id, tus, v,
        |        SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM g)
        |SELECT user_id, MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q99_session_window" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
        |g AS (SELECT user_id, tus, v,
        |        CASE WHEN LAG(tus) OVER w IS NULL
        |               OR tus - LAG(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
        |s AS (SELECT user_id, tus, v,
        |        SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM g)
        |SELECT user_id, MIN(tus) AS session_start_us, MAX(tus) AS session_end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q100_edit_distance" ->
      """WITH d AS (SELECT doc_id, text, split_part(text, ' ', 1) AS w0,
        |             len(string_split(text, ' ')) AS nw FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
        |  CAST(CASE WHEN levenshtein(a.text, b.text) <= 64 THEN 1 ELSE 0 END
        |       AS BIGINT) AS is_dup
        |FROM d a JOIN d b
        |  ON a.w0 = b.w0 AND a.nw = b.nw AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q101_funnel" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
        |v AS (SELECT user_id, MIN(tus) AS t_view FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.tus) AS t_click FROM e
        |      JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tus > v.t_view
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.tus) AS t_purchase FROM e
        |      JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tus > c.t_click
        |      GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q102_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, c.cohort_week,
        |        e.wk - c.cohort_week AS week_offset
        |      FROM e JOIN c USING (user_id))
        |SELECT cohort_week, week_offset, COUNT(*) AS n_users
        |FROM a GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q103_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |g AS (SELECT event_type AS from_type,
        |        LEAD(event_type) OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS to_type
        |      FROM e)
        |SELECT from_type, to_type, COUNT(*) AS n FROM g
        |WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,

    // independent ground truth: the gate constructs both snapshots from
    // key arithmetic, so the oracle derives every status WITHOUT running
    // a diff — it checks the full-outer-join machinery against closed form
    "q104_snapshot_diff" ->
      """SELECT o_orderkey, CASE
        |  WHEN o_orderkey % 5 = 0 AND o_orderkey % 7 != 0 THEN 'added'
        |  WHEN o_orderkey % 7 = 0 AND o_orderkey % 5 != 0 THEN 'removed'
        |  ELSE 'changed' END AS status
        |FROM orders
        |WHERE (o_orderkey % 5 = 0 AND o_orderkey % 7 != 0)
        |   OR (o_orderkey % 7 = 0 AND o_orderkey % 5 != 0)
        |   OR (o_orderkey % 5 != 0 AND o_orderkey % 7 != 0
        |       AND o_orderkey % 3 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q105_trending" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, event_type
        |           FROM events),
        |c AS (SELECT hour, event_type, COUNT(*) AS n FROM e
        |      GROUP BY hour, event_type),
        |r AS (SELECT hour, event_type, n,
        |        ROW_NUMBER() OVER (PARTITION BY hour
        |          ORDER BY n DESC, event_type) AS rnk
        |      FROM c)
        |SELECT hour, event_type, n, rnk FROM r WHERE rnk <= 3
        |ORDER BY hour, rnk""".stripMargin,

    "q106_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |c AS (SELECT user_id, event_id, tus, event_type,
        |        LAG(event_type) OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS prev_type
        |      FROM e),
        |f AS (SELECT * FROM c
        |      WHERE prev_type IS NULL OR prev_type != event_type)
        |SELECT user_id, event_type AS state, tus AS valid_from_us,
        |       LEAD(tus) OVER (PARTITION BY user_id
        |         ORDER BY tus, event_id) AS valid_to_us
        |FROM f ORDER BY user_id, valid_from_us""".stripMargin,

    // the bloom prefilter is invisible to semantics (false positives are
    // removed by the exact semi join), so the oracle IS the plain semi join
    "q107_bloom_semijoin" ->
      s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |       ${CENTS.format("l_extendedprice")} AS price_c
         |FROM lineitem
         |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
         |                     WHERE o_totalprice > 400000.0)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q108_user_paths" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |r AS (SELECT user_id, event_type,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY tus, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n_events
        |      FROM e)
        |SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
        |       MAX(n_events) AS n_events
        |FROM r WHERE rn <= 20 GROUP BY user_id ORDER BY user_id""".stripMargin,

    // integer permille half-life weights: 1000 >> age_buckets, saturating
    // at bucket 20 (weight already 0) — exact 64-bit in both engines
    "q109_decayed_score" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT MAX(tus) AS tmax FROM e),
        |w AS (SELECT user_id, cents,
        |        1000 // (CAST(1 AS BIGINT) << LEAST(
        |          CAST((tmax - tus) // 86400000000 AS INT), 20)) AS w_permille
        |      FROM e, m)
        |SELECT user_id, CAST(SUM(cents * w_permille) AS BIGINT) AS score_permille,
        |       COUNT(*) AS n_events
        |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q110_mode" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events
        |           GROUP BY user_id, event_type),
        |r AS (SELECT user_id, event_type, n,
        |        ROW_NUMBER() OVER (PARTITION BY user_id
        |          ORDER BY n DESC, event_type) AS rnk
        |      FROM c)
        |SELECT user_id, event_type AS mode_value, n FROM r WHERE rnk = 1
        |ORDER BY user_id""".stripMargin,

    // exact fixed-point PageRank: every iteration is pure 64-bit integer
    // arithmetic (ppm ranks, truncating division — `//` ≡ Spark `div` on
    // the non-negative values here), replayed as chained CTEs
    "q111_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT 2*l_partkey AS s, 2*l_suppkey+1 AS d
        |            FROM lineitem),
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
        |       FROM n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, r AS pr FROM r3 ORDER BY node""".stripMargin,

    "q112_resample" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS tus,
        |             CAST(FLOOR(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT event_type, tus // 3600000000 AS bucket, cents FROM e),
        |a AS (SELECT event_type, bucket, COUNT(*) AS n_obs,
        |        CAST(SUM(cents) AS BIGINT) AS sum_c
        |      FROM b GROUP BY event_type, bucket),
        |bounds AS (SELECT MIN(bucket) AS bmin, MAX(bucket) AS bmax FROM b),
        |grid AS (SELECT t.event_type, g.bucket
        |         FROM (SELECT DISTINCT event_type FROM events) t,
        |              (SELECT UNNEST(generate_series(bmin, bmax)) AS bucket
        |               FROM bounds) g)
        |SELECT grid.event_type, grid.bucket,
        |       COALESCE(a.n_obs, 0) AS n_events, a.sum_c,
        |       LAST_VALUE(a.sum_c IGNORE NULLS) OVER (
        |         PARTITION BY grid.event_type ORDER BY grid.bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_sum_c
        |FROM grid LEFT JOIN a
        |  ON grid.event_type = a.event_type AND grid.bucket = a.bucket
        |ORDER BY grid.event_type, grid.bucket""".stripMargin,

    "q113_histogram" ->
      """WITH v AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
        |           FROM lineitem)
        |SELECT v // 500000 AS bin, (v // 500000) * 500000 AS lo,
        |       COUNT(*) AS n, MIN(v) AS min_v, MAX(v) AS max_v,
        |       CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM v GROUP BY bin, lo ORDER BY bin""".stripMargin,
  )
}

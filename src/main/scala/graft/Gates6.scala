package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Gate-registry shard 6 (q229–q254): each gate's Spark lambda and
  * its DuckDB oracle SQL side by side — pure relocation of the
  * [[SparkEntry]] registry (r15 verdict #6), no behavior change.
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] assemble the shards.
  */
private[graft] object Gates6 {
  import GateSupport._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ── the count-min cube contract, WEIGHTED: per-flag sketches of part
    // keys weighted by quantity ROLL UP (element-wise add, never the raw
    // rows) to the same global counters a direct weighted sketch
    // computes — the oracle takes the direct path, the gate the
    // stored-cube path, and they must agree cell-for-cell ────────────────
    "q229_cms_rollup" -> ((s, dir) => {
      val li = s.read.parquet(t(dir, "lineitem"))
        .withColumn("qty", floor(col("l_quantity")).cast(LongType))
      val fine = graft.operators.CountMinSketch.sketch(
        li, Seq("l_returnflag"), "l_partkey", weightCol = Some("qty"))
      graft.operators.CountMinSketch.rollup(fine, "sketch", 4, 128, Nil)
        .select(posexplode(col("sketch")))
        .filter(col("col") > 0L)
        .select(col("pos").cast(LongType).as("slot"), col("col").as("c"))
        .orderBy("slot")
    }),

    // ── streaming count-min maintainer (r14): per-user value-frequency
    // counters as an add-fold over micro-batches — NOT idempotent (the
    // line between this and q225's distinct max-fold: re-delivery counts
    // twice, so at-least-once sources dedup upstream); the final
    // snapshot must equal the batch counters the DuckDB oracle computes
    // directly (a slice for the q97 reason: driver-fed replay) ──────────
    "q230_stream_cms" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      // the registers read: the maintainer's sparse state IS the gate's
      // output shape — no O(keys · depth·width) dense materialization
      // only to re-sparsify (r15)
      graft.streaming.EventStreaming.cmsReplay(evts, nChunks = 3,
          registers = true)
        .select(col("userId").as("user_id"), col("slot"), col("c"))
        .orderBy("user_id", "slot")
    }),

    // ── incremental connected components (r14): fold a batch of NEW
    // edges into STORED component labels without re-reading the old
    // edges — the clustering family's warm start (q227's sibling). The
    // quotient graph (delta endpoints lifted to their old
    // representatives) is the only iterative work; the corpus label
    // table is touched once, map-side, by a broadcast relabel map. The
    // fixture is a star-of-stars (leaves→32-hubs cold; hub→1024-superhub
    // + fresh-id edges as the delta) so the oracle's fixed-round min
    // propagation is provably converged (diameter ≤ 3, 5 rounds run) ────
    "q231_cc_delta" -> ((s, dir) => {
      val keys = s.read.parquet(t(dir, "orders")).select(col("o_orderkey").as("k"))
      val e = keys.filter(col("k") % 32 =!= 0)
        .select(col("k").as("doc_a"), (col("k") - col("k") % 32).as("doc_b"))
      val nodes = e.select(col("doc_a").as("doc_id"))
        .union(e.select(col("doc_b").as("doc_id"))).distinct()
      val cold = Dedup.clustersStars(nodes, e)
      val hubs = e.select(col("doc_b").as("h")).distinct()
      val bridge = hubs.filter(col("h") % 1024 =!= 0)
        .select(col("h").as("doc_a"), (col("h") - col("h") % 1024).as("doc_b"))
      val fresh = keys.filter(col("k") % 97 === 0 && col("k") % 32 =!= 0)
        .select((col("k") + 1000000000L).as("doc_a"), col("k").as("doc_b"))
      Dedup.ccDelta(cold, bridge.union(fresh))
    }),

    // ── integer-exact k-means (r14): Lloyd rounds with centroids
    // quantized to a fixed 1/1024 grid and seeds picked by md5 order —
    // every arithmetic step is Int64 math both engines replay
    // bit-for-bit (the q92 integer-exact stance applied to clustering),
    // so the ASSIGNMENT ITSELF is hash-gated, not spot-checked.
    // Centroids are O(k·d) driver state (the MLlib layout / splitter-
    // collect class); per-round exchange is O(N·k) argmin rows ──────────
    "q232_kmeans" -> ((s, dir) => {
      graft.embed.Clustering.kmeans(
        s.read.parquet(t(dir, "embeddings")), "vec_id", "embedding",
        k = 8, rounds = 3)
    }),

    // ── SemDeDup-style semantic dedup (r14): cluster first (q232's
    // k-means), then exact integer-cosine pairs WITHIN clusters only —
    // pair work bounded by cluster sizes, never N²; a vector that
    // near-duplicates (cos ≥ 0.8) a smaller-id clustermate is marked
    // with its earliest duplicate. The oracle replays the full chain:
    // kmeans rounds, then q54's score grid within the final clusters ────
    "q233_semdedup" -> ((s, dir) => {
      graft.embed.Clustering.semDedup(
        s.read.parquet(t(dir, "embeddings")), "vec_id", "embedding",
        k = 8, rounds = 3, minScore1e6 = 800000L)
    }),

    // ── streaming connected-components maintainer (r14): q231's edge
    // set folded in as 2 micro-batches of NEW edges — each batch pays
    // only its delta-bounded quotient CC + one map-side relabel of the
    // snapshot; ccDelta's incremental == one-shot law means ANY
    // chunking must land on the one-shot CC the oracle computes ─────────
    "q234_stream_cc" -> ((s, dir) => {
      import s.implicits._
      // half the key universe (k even): the contract is chunked-ingest
      // == one-shot, which a half-size graph exercises identically —
      // the full graph is q231's (one-shot) fixture
      val keys = s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey").as("k")).filter(col("k") % 2 === 0)
      val e = keys.filter(col("k") % 32 =!= 0)
        .select(col("k").as("doc_a"), (col("k") - col("k") % 32).as("doc_b"))
      val hubs = e.select(col("doc_b").as("h")).distinct()
      val bridge = hubs.filter(col("h") % 1024 =!= 0)
        .select(col("h").as("doc_a"), (col("h") - col("h") % 1024).as("doc_b"))
      val fresh = keys.filter(col("k") % 97 === 0 && col("k") % 32 =!= 0)
        .select((col("k") + 1000000000L).as("doc_a"), col("k").as("doc_b"))
      val all = e.union(bridge).union(fresh)
        .select(col("doc_a").as("docA"), col("doc_b").as("docB"))
        .as[graft.streaming.EventStreaming.GraphEdge]
      // 2 chunks: the replay cost is CC-fixpoint count × stage latency,
      // not edge volume — 2 batches exercise cold-start + delta-fold,
      // which IS the contract (EventStreamingSpec pins 1/3/7 chunks)
      graft.streaming.EventStreaming.ccReplay(all, nChunks = 2)
    }),

    // ── k-means SERVE path (r14): the clustering family's warm start —
    // train centroids on two thirds of the vectors, store the O(k·d)
    // model table, assign the HELD-OUT third against it with no
    // re-training (plan-literal scoring, no join). The oracle replays
    // the training rounds on the same subset, then scores the held-out
    // vectors against the final centroid model c2 ───────────────────────
    "q235_kmeans_assign" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val cents = graft.embed.Clustering.kmeansCentroids(
        emb.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding",
        k = 8, rounds = 3)
      graft.embed.Clustering.kmeansAssign(cents,
        emb.filter(col("vec_id") % 3 === 0), "vec_id", "embedding")
    }),

    // ── incremental SEMANTIC dedup (r14): q227's stored-corpus contract
    // for embeddings — flag delta vectors that duplicate the corpus (or
    // an earlier delta vector) using only the stored (vec, cluster)
    // table and the centroid model; corpus×corpus never re-examined,
    // pair work bounded by |delta| × cluster sizes. The oracle replays
    // training, both assignments, and the q54 cosine grid ───────────────
    "q236_semdedup_delta" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      val train = emb.filter(col("vec_id") % 3 =!= 0)
      val cents = graft.embed.Clustering.kmeansCentroids(
        train, "vec_id", "embedding", k = 8, rounds = 3)
      val corpus = train.join(
        graft.embed.Clustering.kmeansAssign(cents, train, "vec_id", "embedding")
          .select(col("vec_id"), col("cluster")), "vec_id")
      graft.embed.Clustering.semDedupDelta(corpus,
        emb.filter(col("vec_id") % 3 === 0), cents,
        "vec_id", "embedding", minScore1e6 = 800000L)
    }),

    // ── the CMS ESTIMATE read, oracle-gated (r14): min over the d
    // counters a probe value hashes to is pure integer arithmetic, so
    // unlike the HLL estimate (float harmonic means, spec-only) the
    // count-min READ path is exactly replayable — per-type estimates
    // for a probe set of user ids, never touching the raw rows ──────────
    "q237_cms_estimate" -> ((s, dir) => {
      // both sides share ONE group universe by construction: rows with a
      // NULL event_type or NULL user_id are excluded BEFORE the sketch,
      // so the gate's sketch groups and the oracle's tt CTE are the same
      // set even if the fixture ever gains such rows
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      val sk = graft.operators.CountMinSketch.sketch(
        ev, Seq("event_type"), "user_id")
      val probes = ev.filter(col("user_id") % 50 === 0)
        .select(col("user_id").as("p")).distinct()
      graft.operators.CountMinSketch.estimates(sk, "sketch", probes, 4, 128)
        .orderBy("event_type", "p")
    }),

    // ── incremental IVF index maintenance (r15): the similarity
    // family's warm start — train md5-seeded centroids on the corpus
    // two-thirds (q89's oracle-replayable convention), store the
    // inverted file, then fold the held-out third in against the STORED
    // model with no re-training; fold-in ≡ one-shot is the operator's
    // law, and the oracle replays exactly the one-shot side (all
    // vectors assigned to corpus-trained centroids). NULL-embedding
    // rows are excluded up front on both sides (the q84 stance) ─────────
    "q238_ivf_delta" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
        .filter(col("embedding").isNotNull && col("vec_id") >= 5)
      val corpus = emb.filter(col("vec_id") % 3 =!= 0)
      val delta = emb.filter(col("vec_id") % 3 === 0)
      val cents = Similarity.ivfCentroids(corpus, nCells = 8,
        seedOrder = md5(col("vec_id").cast(StringType).cast(BinaryType)))
      val inverted = Similarity.ivfAssign(corpus, cents)
      Similarity.ivfAssignDelta(cents, inverted, delta).orderBy("vec_id")
    }),

    // ── incremental PQ code maintenance (r15): q84's SQL-replayable
    // seed codebooks trained on the corpus two-thirds, corpus encoded
    // and stored, then the held-out third encoded against the STORED
    // codebooks and folded in — fold-in ≡ one-shot; output exploded to
    // (vec_id, sub, code) rows (the oracle's native shape) ──────────────
    "q239_pq_delta" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
        .filter(col("embedding").isNotNull && col("vec_id") >= 5)
      val corpus = emb.filter(col("vec_id") % 3 =!= 0)
      val delta = emb.filter(col("vec_id") % 3 === 0)
      val cb = graft.embed.Pq.seedCodebooks(
        corpus.orderBy("vec_id").limit(16), m = 8)
      val codes = graft.embed.Pq.encode(corpus, cb)
      graft.embed.Pq.encodeDelta(cb, codes, delta)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("sub", "code")))
        .select(col("vec_id"), col("sub").cast(LongType).as("sub"), col("code"))
        .orderBy("vec_id", "sub")
    }),

    // ── portable KMV (bottom-1-per-bucket MinHash) SET sketch (r15):
    // per-type register vectors whose element-wise-MIN merge supports
    // DIRECT Jaccard / intersection / difference reads — the set-ops
    // capability HLL's inclusion-exclusion fundamentally lacks. Same
    // portability contract as the HLL/CMS siblings: md5-derived plain
    // BIGINT arrays any engine replays cell-for-cell; ONE map-side-
    // combined agg of 256 conditional MINs, the exchange per group one
    // fixed-width vector, never user ids ─────────────────────────────────
    "q240_kmv_registers" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      graft.operators.KmvSketch.registers(ev, Seq("event_type"), "user_id")
    }),

    // ── the KMV cube contract: per-type register vectors ROLL UP
    // (element-wise min over hit registers, never the raw rows) to the
    // same global registers a direct sketch computes — the oracle takes
    // the direct path, the gate the stored-cube path, cell-for-cell ──────
    "q241_kmv_rollup" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      val fine = graft.operators.KmvSketch.sketch(
        ev, Seq("event_type"), "user_id")
      graft.operators.KmvSketch.rollup(fine, "kmv", 2, Nil)
        .select(posexplode(col("kmv")))
        .filter(col("col") > 0L)
        .select(col("pos").cast(LongType).as("bucket"), col("col").as("r"))
        .orderBy("bucket")
    }),

    // ── KMV set-operation reads for every event-type pair: exact match/
    // hit counts plus the RATIONAL estimates (union / intersection /
    // both differences / Jaccard) — exact integer sums + IEEE division
    // and floor, no transcendentals, so unlike the HLL estimate the
    // READS themselves are oracle-gated, not just the state. The pair
    // join is the q237 shape: two O(types) sketch tables in a broadcast
    // product, the raw rows long since discarded ─────────────────────────
    "q242_kmv_setops" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      graft.operators.KmvSketch.setops(ev, "event_type", "user_id")
    }),

    // ── streaming set-sketch maintainer: per-DAY user-set KMV registers
    // as a register-min fold over micro-batches — idempotent, so
    // at-least-once re-delivery needs no pre-dedup; the final snapshot
    // must equal the batch registers the DuckDB oracle computes directly
    // (and the snapshots feed setops: day-over-day overlap from stored
    // state, never re-reading events). Driver-fed replay, the q97 caveat ─
    "q243_stream_kmv" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.kmvReplay(evts, nChunks = 3,
          registers = true)
        .select(col("day"), col("slot").as("bucket"), col("r"))
        .orderBy("day", "bucket")
    }),

    // ── KMV contamination TRIAGE (r15): per-source benchmark-overlap
    // estimates from word-4-gram set sketches — the sketch-first pass
    // that decides WHICH sources get q69's exact n-gram
    // decontamination join at all. Gram strings never reach an
    // exchange (two scans collapsing into fixed-width sketches); all
    // reads rational → oracle-gated, not just the state ─────────────────
    "q244_contamination_est" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .filter(col("text").isNotNull && col("source").isNotNull)
      graft.text.Pipeline.contaminationEstimate(
        docs, docs.filter(col("doc_id") % 17 === 0), n = 4)
    }),

    // ── portable AMS / count-sketch (r15): SIGNED counters whose reads
    // are UNBIASED (point frequency, F2, join size) — the analysis
    // complement of the CMS's never-under planner bound. Same md5
    // portability contract; 0 is the true additive identity, so
    // cancelled and never-hit counters correctly coincide ────────────────
    "q245_countsketch_registers" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      graft.operators.CountSketch.registers(ev, Seq("event_type"), "user_id")
    }),

    // ── the count-sketch cube contract: per-type SIGNED counters ROLL
    // UP (element-wise add — cancellation across cells is the signed
    // monoid working, not loss) to the same global counters a direct
    // sketch computes ────────────────────────────────────────────────────
    "q246_countsketch_rollup" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      val fine = graft.operators.CountSketch.sketch(
        ev, Seq("event_type"), "user_id")
      graft.operators.CountSketch.rollup(fine, "sketch", 5, 128, Nil)
        .select(posexplode(col("sketch")))
        .filter(col("col") =!= 0L)
        .select(col("pos").cast(LongType).as("slot"), col("col").as("c"))
        .orderBy("slot")
    }),

    // ── UNBIASED join-size estimate from two stored count-sketches
    // (events.user_id ⋈ orders.o_custkey — genuinely multi-per-key on
    // both sides): median over the depth rows of the signed counter dot
    // product, integer arithmetic end-to-end, so the ESTIMATE is
    // oracle-gated. The q237 shape: two one-row sketch tables in a
    // broadcast product, raw rows long since collapsed ──────────────────
    "q247_ams_join_size" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
      val ord = s.read.parquet(t(dir, "orders"))
      val a = graft.operators.CountSketch.sketch(ev, Nil, "user_id",
        out = "a")
      val b = graft.operators.CountSketch.sketch(ord, Nil, "o_custkey",
        out = "b")
      broadcast(a).crossJoin(b).select(
        graft.operators.CountSketch.estimateJoinSize(col("a"), col("b"),
          5, 128).cast(LongType).as("join_size_est"))
    }),

    // ── streaming count-sketch maintainer: per-user SIGNED value-
    // frequency counters as an add-fold over micro-batches (exactly-
    // once like the CMS — re-delivery counts twice); the final sparse
    // snapshot (zero-sum slots filtered: they ARE the additive
    // identity, so the read is chunking-invariant) must equal the batch
    // counters the DuckDB oracle computes directly ───────────────────────
    "q248_stream_countsketch" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.csReplay(evts, nChunks = 3,
          registers = true)
        .select(col("userId").as("user_id"), col("slot"), col("c"))
        .orderBy("user_id", "slot")
    }),

    // ── exact-rational per-series AUTOCORRELATION (r15): ACF of each
    // event type's daily-revenue series at lags 1..7 — numerator and
    // denominator are exact scaled integers (DECIMAL accumulation), the
    // emitted acf ONE IEEE division of them, so the DOUBLE itself
    // oracle-gates (the KMV/AMS determinism recipe applied to a
    // classical statistic). One partitioned window pass + one agg ────────
    "q249_acf" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
      val daily = ev
        .withColumn("tsUs", EventOps.tsMicros(ev))
        .withColumn("day", expr("tsUs div 86400000000"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(cents(col("value"))).as("x"))
      graft.operators.Autocorr.acf(daily, Seq("event_type"), "day", "x",
        maxLag = 7)
    }),

    // ── three-way KMV set expression: |A∩B∩C| per event-type TRIPLE
    // from the stored sketches — where inclusion-exclusion would
    // compound SEVEN estimates' errors, the registers read the 3-way
    // Jaccard directly (agreement samples the 3-way union's minimum).
    // Same q237-shape broadcast product, raw rows long since collapsed ──
    "q250_kmv_triples" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      graft.operators.KmvSketch.setops3(ev, "event_type", "user_id")
    }),

    // ── portable BLOOM filter (r15): per-type membership words from the
    // same md5 portability contract — 63 usable bits per BIGINT word
    // (the sign bit is the documented portability bound: checked ANSI
    // engines raise on 1<<63), k=4 double-hashed probes, merge =
    // bitwise OR. The SPARSE (slot, w) form is the sketch's PRIMARY
    // shape: a Bloom filter's size must scale with its set (unlike
    // HLL's fixed 256), so the state is O(hit words) rows at any m —
    // here m = 258048 bits, sized for the sf0.1 user population.
    // Values never reach an exchange ────────────────────────────────────
    "q251_bloom_registers" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull)
      graft.operators.BloomSketch.registers(ev, Seq("event_type"),
        "user_id", numWords = 4096, k = 4)
    }),

    // ── the Bloom cube contract: per-type DENSE word vectors (of the
    // types' ACTIVE-DAY sets — a set the 4032-bit dense form holds at
    // moderate fill) ROLL UP (element-wise bitwise OR, never the raw
    // rows) to the same global words a direct sketch computes —
    // idempotent like the HLL/KMV merges, so any grouping/duplication
    // lands on the same cells ───────────────────────────────────────────
    "q252_bloom_rollup" -> ((s, dir) => {
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
      val ev = raw
        .withColumn("tsUs", EventOps.tsMicros(raw))
        .withColumn("day", expr("tsUs div 86400000000"))
      val fine = graft.operators.BloomSketch.sketch(
        ev, Seq("event_type"), "day", numWords = 64, k = 4)
      graft.operators.BloomSketch.rollup(fine, "bloom", 64, Nil)
        .select(posexplode(col("bloom")))
        .filter(col("col") =!= 0L)
        .select(col("pos").cast(LongType).as("slot"), col("col").as("w"))
        .orderBy("slot")
    }),

    // ── SOUND decontamination pre-filter (r15): every doc's word
    // 4-grams probed against a Bloom filter of the benchmark slice's
    // grams — n_maybe = 0 is a THEOREM of no overlap (Bloom's one-sided
    // error), so the certified-clean majority skips q69's exact join;
    // false positives only cost, never leak. Gram strings never reach
    // an exchange (probes travel as two 60-bit md5 slices); the state
    // broadcasts. Everything integer → the VERDICTS oracle-gate ─────────
    "q253_bloom_prefilter" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
        .filter(col("text").isNotNull)
      graft.text.Pipeline.decontamPrefilter(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        n = 4, numWords = 16384, k = 3)
    }),

    // ── streaming Bloom maintainer: per-user active-day membership
    // words as an OR-fold over micro-batches — idempotent (the
    // HLL/KMV operational property: at-least-once re-delivery needs no
    // dedup); the final sparse snapshot must equal the batch words the
    // DuckDB oracle computes directly. Driver-fed replay, the q97
    // caveat ────────────────────────────────────────────────────────────
    "q254_stream_bloom" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
        .filter(col("event_type") === "click")
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"), cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.bloomReplay(evts, nChunks = 3,
          numWords = 8, k = 4, registers = true)
        .select(col("userId").as("user_id"), col("slot"), col("w"))
        .orderBy("user_id", "slot")
    }),

    // ── JL ±1 random projection (r15): 64-dim embeddings → 16 exact-
    // integer coordinates from an md5-derived sign matrix (Achlioptas
    // 2003 — no RNG state, the matrix replays as SQL literals). ONE
    // narrow map pass, stored beside the vector at ingest: the 100 TB
    // shortlist space at 1/4 the scan bandwidth. Projections are
    // Int64-exact, so the CELLS oracle-gate ───────────────────────────────
    "q255_jl_project" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      graft.embed.Jl.projectRows(emb, "vec_id", "embedding")
    }),

    // ── the JL two-stage ANN read: shortlist 40 per query by projected
    // squared distance (exact integers, ties on cand_id — deterministic
    // and replayable), exact integer-cosine rerank of the shortlist
    // only (the q22 arithmetic verbatim). Candidates scanned ONCE
    // against broadcast projected queries; only |Q|·40 rows reach the
    // rerank join. Recall is spec-measured; the ANSWER hash-matches ──────
    "q256_jl_rerank" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      graft.embed.Jl.jlTopK(emb.filter(col("vec_id") < 8),
        emb.filter(col("vec_id") >= 8), k = 10, shortK = 40)
    }),

    // ── exact-rational CROSS-correlation (r15): does click revenue
    // LEAD purchase revenue, per user cohort? CCF of the two daily
    // series at lags −5..5 — q249's recipe two-series: n²-scaled
    // numerator and both denominator factors exact integers, the
    // emitted DOUBLE one fixed IEEE cast/multiply/sqrt/divide chain, so
    // the CCF values themselves hash-match. One PARTITIONED window pass
    // (per-cohort series — the operator's many-series shape) + one agg ──
    "q257_ccf" -> ((s, dir) => {
      val ev = s.read.parquet(t(dir, "events"))
        .filter(col("event_type").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull && col("user_id").isNotNull)
      val withDay = ev
        .withColumn("tsUs", EventOps.tsMicros(ev))
        .withColumn("cohort", col("user_id") % 4)
        .withColumn("day", expr("tsUs div 86400000000"))
      def series(typ: String, out: String) = withDay
        .filter(col("event_type") === typ)
        .groupBy("cohort", "day").agg(sum(cents(col("value"))).as(out))
      graft.operators.Autocorr.ccf(
        series("click", "x").join(series("purchase", "y"),
          Seq("cohort", "day")),
        Seq("cohort"), "day", "x", "y", maxLag = 5)
    }),

    // ── the SOUNDNESS EQUIVALENCE, end to end: decontamination via the
    // Bloom pre-filter (certified-clean docs pass through, the exact
    // gram join runs ONLY on the flagged sliver) must equal q69's plain
    // exact pass row-for-row — contaminated ⊆ flagged is the one-sided-
    // error THEOREM, and this gate's oracle IS q69's exact SQL, so the
    // hash match proves the composition, not just the parts ─────────────
    "q258_prefiltered_decontam" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      graft.text.Pipeline.decontaminateNgramsPrefiltered(
        docs, docs.filter(col("doc_id") % 17 === 0), n = 4)
    }),
  )

  val oracles: Seq[(String, String)] = Seq(

    // the DIRECT weighted global counters — the gate reaches the same
    // cells via the per-flag stored vectors, which is the cube contract
    "q229_cms_rollup" ->
      """WITH h AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS w,
        |             md5(CAST(l_partkey AS VARCHAR)) AS hx
        |           FROM lineitem WHERE l_partkey IS NOT NULL),
        |s AS (SELECT w,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot
        |      FROM h, UNNEST(range(4)) AS t(i))
        |SELECT slot, CAST(SUM(w) AS BIGINT) AS c
        |FROM s GROUP BY slot ORDER BY slot""".stripMargin,

    // the BATCH counters of per-user click-value frequencies — the gate
    // reaches the same cells by folding 3 micro-batches through the
    // streaming maintainer (counter add is a monoid: any chunking with
    // exactly-once delivery lands here)
    "q230_stream_cms" -> {
      val v = CENTS.format("value")
      s"""WITH t AS (SELECT user_id, $v AS v FROM events
        |           WHERE event_type = 'click'),
        |h AS (SELECT user_id, md5(CAST(v AS VARCHAR)) AS hx
        |      FROM t WHERE v IS NOT NULL),
        |s AS (SELECT user_id,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot
        |      FROM h, UNNEST(range(4)) AS t2(i))
        |SELECT user_id, slot, CAST(COUNT(*) AS BIGINT) AS c
        |FROM s GROUP BY user_id, slot
        |ORDER BY user_id, slot""".stripMargin
    },

    // one-shot CC of the union graph by fixed-round min-label
    // propagation over the closed neighborhood — exact here because the
    // fixture's diameter is ≤ 3 by construction (star-of-stars), so 5
    // rounds are provably past the fixpoint
    "q231_cc_delta" ->
      """WITH keys AS (SELECT o_orderkey AS k FROM orders),
        |e AS MATERIALIZED (
        |  SELECT k AS a, k - k % 32 AS b FROM keys WHERE k % 32 <> 0),
        |hubs AS (SELECT DISTINCT b AS h FROM e),
        |delta AS MATERIALIZED (
        |  SELECT h AS a, h - h % 1024 AS b FROM hubs WHERE h % 1024 <> 0
        |  UNION ALL
        |  SELECT k + 1000000000 AS a, k AS b FROM keys
        |  WHERE k % 97 = 0 AND k % 32 <> 0),
        |ae AS MATERIALIZED (
        |  SELECT a, b FROM e UNION SELECT a, b FROM delta),
        |nodes AS MATERIALIZED (
        |  SELECT a AS node FROM ae UNION SELECT b FROM ae),
        |sym AS MATERIALIZED (
        |  SELECT a AS u, b AS v FROM ae UNION SELECT b, a FROM ae
        |  UNION SELECT node, node FROM nodes),
        |l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes),
        |l1 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l0 l ON s.v = l.node GROUP BY s.u),
        |l2 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l1 l ON s.v = l.node GROUP BY s.u),
        |l3 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l2 l ON s.v = l.node GROUP BY s.u),
        |l4 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l3 l ON s.v = l.node GROUP BY s.u),
        |l5 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l4 l ON s.v = l.node GROUP BY s.u)
        |SELECT node AS doc_id, lbl AS cluster FROM l5 ORDER BY doc_id""".stripMargin,

    // the full 3-round integer-exact Lloyd replay (KMEANS_CTES): the
    // final assignment AND its exact squared distance, cell-for-cell
    "q232_kmeans" ->
      s"""WITH ${kmeansCtes("TRUE")}
        |SELECT vec_id, cluster, d2 FROM a3 ORDER BY vec_id""".stripMargin,

    // kmeans chain + q54's integer-cosine score grid WITHIN the final
    // clusters: dup_of = min smaller-id clustermate at score >= 0.8e6
    "q233_semdedup" ->
      s"""WITH ${kmeansCtes("TRUE")},
        |ev AS MATERIALIZED (
        |  SELECT e.vec_id, g.cluster,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings e JOIN a3 g ON e.vec_id = g.vec_id),
        |pr AS MATERIALIZED (
        |  SELECT a.vec_id AS vid_a, b.vec_id AS vid_b,
        |    CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS dot,
        |    CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS qn,
        |    CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS cn
        |  FROM ev a JOIN ev b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
        |sc AS (SELECT vid_a, vid_b,
        |         CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |           / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT)
        |           AS score
        |       FROM pr WHERE qn != 0 AND cn != 0),
        |d AS (SELECT vid_b AS vec_id, MIN(vid_a) AS dup_of FROM sc
        |      WHERE score >= 800000 GROUP BY vid_b)
        |SELECT g.vec_id, g.cluster, d.dup_of
        |FROM a3 g LEFT JOIN d ON g.vec_id = d.vec_id
        |ORDER BY g.vec_id""".stripMargin,

    // the one-shot CC of the streamed union graph — identical cells to
    // q231 (the q224/q225 convention: the gate takes the incremental
    // fold, the oracle the direct path)
    "q234_stream_cc" ->
      """WITH keys AS (SELECT o_orderkey AS k FROM orders
        |              WHERE o_orderkey % 2 = 0),
        |e AS MATERIALIZED (
        |  SELECT k AS a, k - k % 32 AS b FROM keys WHERE k % 32 <> 0),
        |hubs AS (SELECT DISTINCT b AS h FROM e),
        |delta AS MATERIALIZED (
        |  SELECT h AS a, h - h % 1024 AS b FROM hubs WHERE h % 1024 <> 0
        |  UNION ALL
        |  SELECT k + 1000000000 AS a, k AS b FROM keys
        |  WHERE k % 97 = 0 AND k % 32 <> 0),
        |ae AS MATERIALIZED (
        |  SELECT a, b FROM e UNION SELECT a, b FROM delta),
        |nodes AS MATERIALIZED (
        |  SELECT a AS node FROM ae UNION SELECT b FROM ae),
        |sym AS MATERIALIZED (
        |  SELECT a AS u, b AS v FROM ae UNION SELECT b, a FROM ae
        |  UNION SELECT node, node FROM nodes),
        |l0 AS MATERIALIZED (SELECT node, node AS lbl FROM nodes),
        |l1 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l0 l ON s.v = l.node GROUP BY s.u),
        |l2 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l1 l ON s.v = l.node GROUP BY s.u),
        |l3 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l2 l ON s.v = l.node GROUP BY s.u),
        |l4 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l3 l ON s.v = l.node GROUP BY s.u),
        |l5 AS MATERIALIZED (SELECT s.u AS node, MIN(l.lbl) AS lbl
        |  FROM sym s JOIN l4 l ON s.v = l.node GROUP BY s.u)
        |SELECT node AS doc_id, lbl AS cluster FROM l5 ORDER BY doc_id""".stripMargin,

    // training rounds replayed on the train subset (pred), then the
    // held-out vectors scored against the final centroid model c2
    "q235_kmeans_assign" ->
      s"""WITH ${kmeansCtes("vec_id % 3 <> 0")},
        |hp AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |         CAST(FLOOR((CAST(UNNEST(embedding) AS DOUBLE) + 2.0) * 1000)
        |           AS BIGINT) AS x
        |  FROM embeddings WHERE vec_id % 3 = 0),
        |ap AS MATERIALIZED (
        |  SELECT h.vec_id, c.cluster,
        |         CAST(SUM((h.x*1024 - c.r)*(h.x*1024 - c.r)) AS BIGINT) AS d2
        |  FROM hp h JOIN c2 c ON h.dim = c.dim GROUP BY h.vec_id, c.cluster)
        |SELECT vec_id, cluster, d2 FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY d2, cluster) AS rn FROM ap) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    // training replay (train subset) -> both assignments (a3 = corpus,
    // ad = delta vs c2) -> q54 cosine grid: delta×corpus + delta×earlier-
    // delta within clusters, MIN matching id
    "q236_semdedup_delta" ->
      s"""WITH ${kmeansCtes("vec_id % 3 <> 0")},
        |hp AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
        |         CAST(FLOOR((CAST(UNNEST(embedding) AS DOUBLE) + 2.0) * 1000)
        |           AS BIGINT) AS x
        |  FROM embeddings WHERE vec_id % 3 = 0),
        |adp AS MATERIALIZED (
        |  SELECT h.vec_id, c.cluster,
        |         CAST(SUM((h.x*1024 - c.r)*(h.x*1024 - c.r)) AS BIGINT) AS d2
        |  FROM hp h JOIN c2 c ON h.dim = c.dim GROUP BY h.vec_id, c.cluster),
        |ad AS MATERIALIZED (
        |  SELECT vec_id, cluster FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY d2, cluster) AS rn FROM adp) WHERE rn = 1),
        |dv AS MATERIALIZED (
        |  SELECT e.vec_id, g.cluster,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings e JOIN ad g ON e.vec_id = g.vec_id),
        |cv AS MATERIALIZED (
        |  SELECT e.vec_id, g.cluster,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings e JOIN a3 g ON e.vec_id = g.vec_id),
        |pr AS MATERIALIZED (
        |  SELECT a.vec_id AS id, b.vec_id AS other,
        |    CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS dot,
        |    CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS qn,
        |    CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS cn
        |  FROM dv a JOIN cv b ON a.cluster = b.cluster
        |  UNION ALL
        |  SELECT a.vec_id, b.vec_id,
        |    CAST(list_dot_product(a.vd, b.vd) AS BIGINT),
        |    CAST(list_dot_product(a.vd, a.vd) AS BIGINT),
        |    CAST(list_dot_product(b.vd, b.vd) AS BIGINT)
        |  FROM dv a JOIN dv b ON a.cluster = b.cluster
        |                     AND b.vec_id < a.vec_id),
        |sc AS (SELECT id, other,
        |         CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |           / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT)
        |           AS score
        |       FROM pr WHERE qn != 0 AND cn != 0),
        |d AS (SELECT id, MIN(other) AS dup_of FROM sc
        |      WHERE score >= 800000 GROUP BY id)
        |SELECT g.vec_id, g.cluster, d.dup_of
        |FROM ad g LEFT JOIN d ON g.vec_id = d.id
        |ORDER BY g.vec_id""".stripMargin,

    // q228's register replay + the estimate READ: min over the 4 cells
    // each probe hashes to (absent cells read 0) per event type
    "q237_cms_estimate" ->
      """WITH ev AS (SELECT event_type, user_id FROM events
        |            WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM ev),
        |s AS (SELECT event_type,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot
        |      FROM h, UNNEST(range(4)) AS t(i)),
        |reg AS MATERIALIZED (
        |  SELECT event_type, slot, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM s GROUP BY event_type, slot),
        |pr AS (SELECT DISTINCT user_id AS p FROM ev
        |       WHERE user_id % 50 = 0),
        |ps AS MATERIALIZED (
        |  SELECT p, i * 128 + (('0x' || substr(md5(CAST(p AS VARCHAR)),
        |           4*i + 1, 4))::BIGINT % 128) AS slot
        |  FROM pr, UNNEST(range(4)) AS t(i)),
        |tt AS (SELECT DISTINCT event_type FROM ev)
        |SELECT t.event_type, ps.p, MIN(COALESCE(r.c, 0)) AS est
        |FROM tt t CROSS JOIN ps
        |LEFT JOIN reg r ON r.event_type = t.event_type AND r.slot = ps.slot
        |GROUP BY t.event_type, ps.p
        |ORDER BY t.event_type, ps.p""".stripMargin,

    // fold-in == one-shot is the operator's law, so the oracle replays
    // the ONE-SHOT side: q89's md5-seeded centroid sample restricted to
    // the corpus two-thirds, then every vector (corpus + delta) assigned
    // to those fixed centroids by max integer cosine (ties to the
    // smallest cell)
    "q238_ivf_delta" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL AND vec_id >= 5),
        |cand AS (SELECT vec_id, vd,
        |           CAST(list_dot_product(vd, vd) AS BIGINT) AS n2 FROM e),
        |cseed AS (SELECT vd, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell
        |          FROM (SELECT vec_id, vd FROM cand WHERE vec_id % 3 != 0
        |                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
        |cents AS (SELECT cell, vd AS cv,
        |            CAST(list_dot_product(vd, vd) AS BIGINT) AS cn FROM cseed)
        |SELECT vec_id, cell FROM (
        |  SELECT c.vec_id, ct.cell,
        |    row_number() OVER (PARTITION BY c.vec_id ORDER BY
        |      CASE WHEN c.n2 = 0 OR ct.cn = 0 THEN NULL
        |      ELSE CAST(FLOOR(1000000.0 * CAST(CAST(list_dot_product(c.vd, ct.cv) AS BIGINT) AS DOUBLE)
        |           / sqrt(CAST(c.n2 AS DOUBLE) * CAST(ct.cn AS DOUBLE))) AS BIGINT) END
        |      DESC NULLS LAST, ct.cell) AS rn
        |  FROM cand c, cents ct) WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    // q84's seed-codebook replay restricted to the corpus two-thirds,
    // then EVERY vector's per-subspace argmin (2·sv·cv − cn maximized,
    // ties to the smallest code) — the one-shot encode the delta fold
    // must land on
    "q239_pq_delta" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings WHERE embedding IS NOT NULL AND vec_id >= 5),
        |seeds AS (SELECT vd, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
        |          FROM e WHERE vec_id % 3 != 0 ORDER BY vec_id LIMIT 16),
        |cbn AS (SELECT t.sub, code, vd[(t.sub*8+1):(t.sub*8+8)] AS cv,
        |          CAST(list_dot_product(vd[(t.sub*8+1):(t.sub*8+8)],
        |                                vd[(t.sub*8+1):(t.sub*8+8)]) AS BIGINT) AS cn
        |        FROM seeds, UNNEST(range(0, 8)) AS t(sub)),
        |cs AS (SELECT vec_id, t.sub, vd[(t.sub*8+1):(t.sub*8+8)] AS sv
        |       FROM e, UNNEST(range(0, 8)) AS t(sub))
        |SELECT vec_id, sub, code FROM (
        |  SELECT cs.vec_id, cs.sub, cbn.code,
        |    row_number() OVER (PARTITION BY cs.vec_id, cs.sub
        |      ORDER BY CAST(2 * list_dot_product(cs.sv, cbn.cv) AS BIGINT) - cbn.cn DESC,
        |               cbn.code) AS arn
        |  FROM cs JOIN cbn USING (sub)) WHERE arn = 1
        |ORDER BY vec_id, sub""".stripMargin,

    // the per-type KMV registers cell-for-cell: bucket = first 2 hex
    // chars of md5, register = 1 + the next 12 chars as a 48-bit int,
    // MIN per (type, bucket) — min absorbs duplicates, which is what
    // makes it a sketch of the SET
    "q240_kmv_registers" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT event_type,
        |       ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
        |       MIN(('0x' || substr(hx, 3, 12))::BIGINT + 1) AS r
        |FROM h GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin,

    // the DIRECT global registers — the gate reaches the same cells via
    // the per-type stored vectors, which is exactly the cube contract
    "q241_kmv_rollup" ->
      """WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL)
        |SELECT ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
        |       MIN(('0x' || substr(hx, 3, 12))::BIGINT + 1) AS r
        |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin,

    // replays the registers, then the EXACT read arithmetic: matches =
    // registers where both sketches agree, hits = union's hit count,
    // Σ = Σ_hit(r−1) + (256−hits)·2^48 (exact BIGINT), and the rational
    // estimator 256·(256·2^48 − Σ)/Σ with the same GREATEST(Σ,1) guard,
    // cast order, multiply-then-divide shape, and FLOOR the Spark reads
    // use — IEEE arithmetic on exact integers is bit-deterministic, so
    // the estimates hash-match, not just the state
    "q242_kmv_setops" ->
      """WITH h AS (SELECT event_type AS k, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |reg AS (SELECT k, ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
        |               MIN(('0x' || substr(hx, 3, 12))::BIGINT + 1) AS r
        |        FROM h GROUP BY k, bucket),
        |ks AS (SELECT DISTINCT k FROM reg),
        |pairs AS (SELECT a.k AS key_a, b.k AS key_b
        |          FROM ks a JOIN ks b ON a.k < b.k),
        |side AS (SELECT p.key_a, p.key_b, r.bucket, r.r, r.k = p.key_a AS is_a
        |         FROM pairs p JOIN reg r ON r.k = p.key_a OR r.k = p.key_b),
        |cell AS (SELECT key_a, key_b, bucket,
        |                MIN(CASE WHEN is_a THEN r END) AS ra,
        |                MIN(CASE WHEN NOT is_a THEN r END) AS rb
        |         FROM side GROUP BY key_a, key_b, bucket),
        |st AS (SELECT key_a, key_b,
        |         CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |                        AND ra = rb THEN 1 ELSE 0 END) AS BIGINT)
        |           AS matches,
        |         CAST(COUNT(*) AS BIGINT) AS hits,
        |         CAST(COUNT(ra) AS BIGINT) AS hits_a,
        |         CAST(COUNT(rb) AS BIGINT) AS hits_b,
        |         CAST(SUM(LEAST(COALESCE(ra, 281474976710657),
        |                        COALESCE(rb, 281474976710657)) - 1) AS BIGINT)
        |           AS sh_u,
        |         CAST(SUM(COALESCE(ra - 1, 0)) AS BIGINT) AS sh_a,
        |         CAST(SUM(COALESCE(rb - 1, 0)) AS BIGINT) AS sh_b
        |       FROM cell GROUP BY key_a, key_b),
        |sg AS (SELECT key_a, key_b, matches, hits, hits_a, hits_b,
        |         CAST(GREATEST(sh_u + (256 - hits) * 281474976710656, 1)
        |           AS DOUBLE) AS su,
        |         CAST(GREATEST(sh_a + (256 - hits_a) * 281474976710656, 1)
        |           AS DOUBLE) AS sa,
        |         CAST(GREATEST(sh_b + (256 - hits_b) * 281474976710656, 1)
        |           AS DOUBLE) AS sb
        |       FROM st),
        |est AS (SELECT key_a, key_b, matches, hits,
        |         CAST(hits AS DOUBLE) * 72057594037927936.0 / su AS raw_u,
        |         CAST(hits_a AS DOUBLE) * 72057594037927936.0 / sa AS raw_a,
        |         CAST(hits_b AS DOUBLE) * 72057594037927936.0 / sb AS raw_b,
        |         CASE WHEN hits = 0 THEN 0.0
        |              ELSE CAST(matches AS DOUBLE) / CAST(hits AS DOUBLE)
        |         END AS jacc
        |        FROM sg)
        |SELECT key_a, key_b, matches, hits,
        |       CAST(FLOOR(raw_u + 0.5) AS BIGINT) AS union_est,
        |       CAST(FLOOR(jacc * raw_u + 0.5) AS BIGINT) AS inter_est,
        |       GREATEST(0, CAST(FLOOR(raw_u - raw_b + 0.5) AS BIGINT))
        |         AS diff_ab_est,
        |       GREATEST(0, CAST(FLOOR(raw_u - raw_a + 0.5) AS BIGINT))
        |         AS diff_ba_est,
        |       jacc AS jaccard_est
        |FROM est ORDER BY key_a, key_b""".stripMargin,

    // the BATCH registers of per-day user sets — the gate reaches the
    // same cells by folding 3 micro-batches through the streaming
    // maintainer (register min is idempotent, so any chunking — and any
    // duplicate delivery — lands here)
    "q243_stream_kmv" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
        |           FROM events
        |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |h AS (SELECT day, md5(CAST(user_id AS VARCHAR)) AS hx FROM d)
        |SELECT day, ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
        |       MIN(('0x' || substr(hx, 3, 12))::BIGINT + 1) AS r
        |FROM h GROUP BY day, bucket
        |ORDER BY day, bucket""".stripMargin,

    // q69's gram construction, then the q242 read arithmetic per
    // (source, benchmark) pair: replays the per-source and benchmark
    // registers, the exact match/hit counts, the exact Σ sums, and the
    // same IEEE division/floor chain — the whole triage read
    // hash-matches, not just the state
    "q244_contamination_est" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |              FROM documents
        |              WHERE text IS NOT NULL AND source IS NOT NULL),
        |g AS (SELECT source, doc_id, array_to_string(ws[i:i+3], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i)),
        |sreg AS (SELECT source, ('0x' || substr(md5(g), 1, 2))::BIGINT AS bucket,
        |                MIN(('0x' || substr(md5(g), 3, 12))::BIGINT + 1) AS r
        |         FROM g GROUP BY source, bucket),
        |breg AS (SELECT ('0x' || substr(md5(g), 1, 2))::BIGINT AS bucket,
        |                MIN(('0x' || substr(md5(g), 3, 12))::BIGINT + 1) AS r
        |         FROM g WHERE doc_id % 17 = 0 GROUP BY bucket),
        |srcs AS (SELECT DISTINCT source FROM sreg),
        |side AS (SELECT source, bucket, r, TRUE AS is_s FROM sreg
        |         UNION ALL
        |         SELECT s.source, b.bucket, b.r, FALSE
        |         FROM srcs s CROSS JOIN breg b),
        |cell AS (SELECT source, bucket,
        |                MIN(CASE WHEN is_s THEN r END) AS rs,
        |                MIN(CASE WHEN NOT is_s THEN r END) AS rb
        |         FROM side GROUP BY source, bucket),
        |st AS (SELECT source,
        |         CAST(SUM(CASE WHEN rs IS NOT NULL AND rb IS NOT NULL
        |                        AND rs = rb THEN 1 ELSE 0 END) AS BIGINT)
        |           AS matches,
        |         CAST(COUNT(*) AS BIGINT) AS hits,
        |         CAST(COUNT(rs) AS BIGINT) AS hits_s,
        |         CAST(COUNT(rb) AS BIGINT) AS hits_b,
        |         CAST(SUM(LEAST(COALESCE(rs, 281474976710657),
        |                        COALESCE(rb, 281474976710657)) - 1) AS BIGINT)
        |           AS sh_u,
        |         CAST(SUM(COALESCE(rs - 1, 0)) AS BIGINT) AS sh_s,
        |         CAST(SUM(COALESCE(rb - 1, 0)) AS BIGINT) AS sh_b
        |       FROM cell GROUP BY source),
        |sg AS (SELECT source, matches, hits, hits_s, hits_b,
        |         CAST(GREATEST(sh_u + (256 - hits) * 281474976710656, 1)
        |           AS DOUBLE) AS su,
        |         CAST(GREATEST(sh_s + (256 - hits_s) * 281474976710656, 1)
        |           AS DOUBLE) AS ss,
        |         CAST(GREATEST(sh_b + (256 - hits_b) * 281474976710656, 1)
        |           AS DOUBLE) AS sb
        |       FROM st),
        |est AS (SELECT source, matches, hits,
        |         CAST(hits_s AS DOUBLE) * 72057594037927936.0 / ss AS raw_s,
        |         CAST(hits_b AS DOUBLE) * 72057594037927936.0 / sb AS raw_b,
        |         CAST(hits AS DOUBLE) * 72057594037927936.0 / su AS raw_u,
        |         CASE WHEN hits = 0 THEN 0.0
        |              ELSE CAST(matches AS DOUBLE) / CAST(hits AS DOUBLE)
        |         END AS jacc
        |        FROM sg)
        |SELECT source, matches, hits,
        |       CAST(FLOOR(raw_s + 0.5) AS BIGINT) AS src_est,
        |       CAST(FLOOR(raw_b + 0.5) AS BIGINT) AS bench_est,
        |       CAST(FLOOR(raw_u + 0.5) AS BIGINT) AS union_est,
        |       CAST(FLOOR(jacc * raw_u + 0.5) AS BIGINT) AS inter_est,
        |       CASE WHEN raw_b > 0.0
        |            THEN CAST(FLOOR(1000.0 * jacc * (raw_u / raw_b) + 0.5)
        |                   AS BIGINT)
        |            ELSE 0 END AS cont_permille
        |FROM est ORDER BY source""".stripMargin,

    // the per-type SIGNED counters cell-for-cell: slot = i·128 + the
    // CMS bucket slice, sign = the parity of hex char 22+i (disjoint
    // from every bucket slice); zero-sum counters are absent — the
    // additive identity, same as never-hit
    "q245_countsketch_registers" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |s AS (SELECT event_type,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot,
        |        1 - 2 * (('0x' || substr(hx, 22 + i, 1))::BIGINT % 2) AS sgn
        |      FROM h, UNNEST(range(5)) AS t(i))
        |SELECT event_type, slot, CAST(SUM(sgn) AS BIGINT) AS c
        |FROM s GROUP BY event_type, slot
        |HAVING SUM(sgn) != 0
        |ORDER BY event_type, slot""".stripMargin,

    // the DIRECT global signed counters — the gate reaches the same
    // cells via the per-type stored vectors (the cube contract; signed
    // cancellation across cells included)
    "q246_countsketch_rollup" ->
      """WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |s AS (SELECT
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot,
        |        1 - 2 * (('0x' || substr(hx, 22 + i, 1))::BIGINT % 2) AS sgn
        |      FROM h, UNNEST(range(5)) AS t(i))
        |SELECT slot, CAST(SUM(sgn) AS BIGINT) AS c
        |FROM s GROUP BY slot HAVING SUM(sgn) != 0
        |ORDER BY slot""".stripMargin,

    // replays BOTH sketches, the per-depth-row signed dot products
    // (exact integers — rows absent from one side contribute zero), and
    // the exact odd-median (row 3 of 5 by value order), floored at 0 —
    // the unbiased estimate itself hash-matches
    "q247_ams_join_size" ->
      """WITH ha AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
        |            FROM events WHERE user_id IS NOT NULL),
        |sa AS (SELECT
        |         i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |           AS slot,
        |         SUM(1 - 2 * (('0x' || substr(hx, 22 + i, 1))::BIGINT % 2))
        |           AS c
        |       FROM ha, UNNEST(range(5)) AS t(i) GROUP BY slot),
        |hb AS (SELECT md5(CAST(o_custkey AS VARCHAR)) AS hx
        |            FROM orders WHERE o_custkey IS NOT NULL),
        |sb AS (SELECT
        |         i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |           AS slot,
        |         SUM(1 - 2 * (('0x' || substr(hx, 22 + i, 1))::BIGINT % 2))
        |           AS c
        |       FROM hb, UNNEST(range(5)) AS t(i) GROUP BY slot),
        |dots AS (SELECT a.slot // 128 AS i, SUM(a.c * b.c) AS d
        |         FROM sa a JOIN sb b USING (slot) GROUP BY 1),
        |alli AS (SELECT t.i, COALESCE(d.d, 0) AS d
        |         FROM UNNEST(range(5)) AS t(i) LEFT JOIN dots d USING (i)),
        |m AS (SELECT d FROM (SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rn
        |                     FROM alli) WHERE rn = 3)
        |SELECT CAST(GREATEST(0, d) AS BIGINT) AS join_size_est FROM m""".stripMargin,

    // the BATCH signed counters of per-user click-value frequencies —
    // the gate reaches the same cells by folding 3 micro-batches
    // through the streaming maintainer (signed add is a monoid: any
    // chunking with exactly-once delivery lands here; zero-sum slots
    // absent on both sides — the additive identity)
    "q248_stream_countsketch" -> {
      val v = CENTS.format("value")
      s"""WITH t AS (SELECT user_id, $v AS v FROM events
        |           WHERE event_type = 'click'),
        |h AS (SELECT user_id, md5(CAST(v AS VARCHAR)) AS hx
        |      FROM t WHERE v IS NOT NULL),
        |s AS (SELECT user_id,
        |        i * 128 + (('0x' || substr(hx, 4*i + 1, 4))::BIGINT % 128)
        |          AS slot,
        |        1 - 2 * (('0x' || substr(hx, 22 + i, 1))::BIGINT % 2) AS sgn
        |      FROM h, UNNEST(range(5)) AS t2(i))
        |SELECT user_id, slot, CAST(SUM(sgn) AS BIGINT) AS c
        |FROM s GROUP BY user_id, slot HAVING SUM(sgn) != 0
        |ORDER BY user_id, slot""".stripMargin
    },

    // the same exact-integer ACF algebra (num/den scaled by n², HUGEINT
    // accumulation — exact, so expression-tree order is irrelevant) and
    // the ONE mirrored division; NULL when den = 0 or no pairs
    "q249_acf" -> {
      val v = CENTS.format("value")
      val leadCols = (1 to 7).map(l =>
        s"LEAD(x, $l) OVER (PARTITION BY event_type ORDER BY day) AS x$l")
        .mkString(", ")
      val aggCols = (1 to 7).map(l =>
        s"COALESCE(SUM(CASE WHEN x$l IS NOT NULL THEN CAST(x AS HUGEINT) " +
          s"* x$l END), 0) AS p$l, " +
        s"COALESCE(SUM(CASE WHEN x$l IS NOT NULL THEN CAST(x AS HUGEINT) " +
          s"END), 0) AS h$l, " +
        s"COALESCE(SUM(CAST(x$l AS HUGEINT)), 0) AS t$l").mkString(", ")
      val lagSelects = (1 to 7).map(l =>
        s"SELECT event_type, CAST(n AS BIGINT) AS n, CAST($l AS BIGINT) " +
        s"AS lag, CASE WHEN n*n*q - n*s*s = 0 OR n <= $l THEN NULL ELSE " +
        s"CAST(n*n*p$l - n*s*(h$l + t$l) + (n - $l)*s*s AS DOUBLE) / " +
        s"CAST(n*n*q - n*s*s AS DOUBLE) END AS acf FROM agg")
        .mkString(" UNION ALL ")
      s"""WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, SUM($v) AS x
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT event_type, x, $leadCols FROM daily),
        |agg AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |          COALESCE(SUM(CAST(x AS HUGEINT)), 0) AS s,
        |          COALESCE(SUM(CAST(x AS HUGEINT) * x), 0) AS q,
        |          $aggCols
        |        FROM w GROUP BY event_type)
        |$lagSelects
        |ORDER BY event_type, lag""".stripMargin
    },

    // replays the registers, then the 3-way read arithmetic per type
    // triple: agreement = all three roles present and equal, union Σ
    // over the 3-way minimum, the same GREATEST/cast/multiply-divide/
    // half-up-floor chain as the pairwise reads
    "q250_kmv_triples" ->
      """WITH h AS (SELECT event_type AS k, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |reg AS (SELECT k, ('0x' || substr(hx, 1, 2))::BIGINT AS bucket,
        |               MIN(('0x' || substr(hx, 3, 12))::BIGINT + 1) AS r
        |        FROM h GROUP BY k, bucket),
        |ks AS (SELECT DISTINCT k FROM reg),
        |tri AS (SELECT a.k AS key_a, b.k AS key_b, c.k AS key_c
        |        FROM ks a JOIN ks b ON a.k < b.k JOIN ks c ON b.k < c.k),
        |side AS (SELECT t.key_a, t.key_b, t.key_c, r.bucket, r.r,
        |                CASE WHEN r.k = t.key_a THEN 0
        |                     WHEN r.k = t.key_b THEN 1 ELSE 2 END AS role
        |         FROM tri t JOIN reg r
        |           ON r.k IN (t.key_a, t.key_b, t.key_c)),
        |cell AS (SELECT key_a, key_b, key_c, bucket,
        |                MIN(CASE WHEN role = 0 THEN r END) AS ra,
        |                MIN(CASE WHEN role = 1 THEN r END) AS rb,
        |                MIN(CASE WHEN role = 2 THEN r END) AS rc
        |         FROM side GROUP BY 1, 2, 3, 4),
        |st AS (SELECT key_a, key_b, key_c,
        |         CAST(SUM(CASE WHEN ra IS NOT NULL AND rb IS NOT NULL
        |                        AND rc IS NOT NULL AND ra = rb AND rb = rc
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS matches3,
        |         CAST(COUNT(*) AS BIGINT) AS hits,
        |         CAST(SUM(LEAST(COALESCE(ra, 281474976710657),
        |                        COALESCE(rb, 281474976710657),
        |                        COALESCE(rc, 281474976710657)) - 1) AS BIGINT)
        |           AS sh_u
        |       FROM cell GROUP BY 1, 2, 3),
        |sg AS (SELECT key_a, key_b, key_c, matches3, hits,
        |         CAST(GREATEST(sh_u + (256 - hits) * 281474976710656, 1)
        |           AS DOUBLE) AS su
        |       FROM st),
        |est AS (SELECT key_a, key_b, key_c, matches3, hits,
        |         CAST(hits AS DOUBLE) * 72057594037927936.0 / su AS raw_u,
        |         CASE WHEN hits = 0 THEN 0.0
        |              ELSE CAST(matches3 AS DOUBLE) / CAST(hits AS DOUBLE)
        |         END AS j3
        |        FROM sg)
        |SELECT key_a, key_b, key_c, matches3, hits,
        |       CAST(FLOOR(raw_u + 0.5) AS BIGINT) AS union_est,
        |       CAST(FLOOR(j3 * raw_u + 0.5) AS BIGINT) AS inter_est
        |FROM est ORDER BY key_a, key_b, key_c""".stripMargin,

    // md5-Bloom word replay: h1/h2 = two 60-bit md5 slices, k=4
    // double-hashed positions over m = 63·4096 bits, word = bit_or of
    // 1 << (pos mod 63) — the 63-bit word layout is the portability
    // bound (DuckDB raises on BIGINT 1<<63)
    "q251_bloom_registers" ->
      """WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
        |           FROM events
        |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |b AS (SELECT event_type,
        |        ('0x' || substr(hx, 1, 15))::BIGINT % 258048 AS h1m,
        |        (('0x' || substr(hx, 16, 15))::BIGINT % 258048) * 2 + 1
        |          AS stride
        |      FROM h),
        |p AS (SELECT event_type, (h1m + i * stride) % 258048 AS pos
        |      FROM b, UNNEST(range(4)) AS t(i))
        |SELECT event_type, pos // 63 AS slot,
        |       CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
        |         AS BIGINT) AS w
        |FROM p GROUP BY event_type, slot
        |ORDER BY event_type, slot""".stripMargin,

    // the DIRECT global words (m = 63·64 bits over the active-day
    // sets) — the gate reaches the same cells via the per-type stored
    // vectors (the cube contract; bitwise OR is idempotent,
    // duplication across cells is absorbed)
    "q252_bloom_rollup" ->
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day
        |           FROM events
        |           WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |h AS (SELECT md5(CAST(day AS VARCHAR)) AS hx FROM d
        |      WHERE day IS NOT NULL),
        |b AS (SELECT ('0x' || substr(hx, 1, 15))::BIGINT % 4032 AS h1m,
        |        (('0x' || substr(hx, 16, 15))::BIGINT % 4032) * 2 + 1
        |          AS stride
        |      FROM h),
        |p AS (SELECT (h1m + i * stride) % 4032 AS pos
        |      FROM b, UNNEST(range(4)) AS t(i))
        |SELECT pos // 63 AS slot,
        |       CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
        |         AS BIGINT) AS w
        |FROM p GROUP BY slot ORDER BY slot""".stripMargin,

    // replays the blocklist filter (word 4-grams of the doc_id%17=0
    // slice into m = 63·16384 bits, k=3), then every corpus doc's
    // distinct gram hash pairs probed against it: a gram is a maybe-hit
    // iff all 3 bits are set, and the per-doc counts and the 0/1
    // needs_exact flag are exact integers — the sound-prefilter
    // verdicts themselves hash-match
    "q253_bloom_prefilter" ->
      """WITH toks AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws
        |              FROM documents WHERE text IS NOT NULL),
        |g AS MATERIALIZED (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i)),
        |blh AS (SELECT DISTINCT md5(g) AS hx FROM g WHERE doc_id % 17 = 0),
        |blp AS (SELECT (('0x' || substr(hx, 1, 15))::BIGINT % 1032192
        |          + i * ((('0x' || substr(hx, 16, 15))::BIGINT % 1032192)
        |                 * 2 + 1)) % 1032192 AS pos
        |        FROM blh, UNNEST(range(3)) AS t(i)),
        |st AS (SELECT pos // 63 AS slot,
        |         CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
        |           AS BIGINT) AS w
        |       FROM blp GROUP BY slot),
        |pr AS (SELECT DISTINCT doc_id,
        |         ('0x' || substr(md5(g), 1, 15))::BIGINT AS h1,
        |         ('0x' || substr(md5(g), 16, 15))::BIGINT AS h2
        |       FROM g WHERE doc_id % 17 <> 0),
        |pp AS (SELECT doc_id, h1, h2,
        |         (h1 % 1032192
        |          + i * ((h2 % 1032192) * 2 + 1)) % 1032192 AS pos
        |       FROM pr, UNNEST(range(3)) AS t(i)),
        |hit AS (SELECT doc_id, h1, h2,
        |          bool_and((COALESCE(w, 0)
        |            & (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))) <> 0)
        |            AS hit
        |        FROM pp LEFT JOIN st ON pp.pos // 63 = st.slot
        |        GROUP BY doc_id, h1, h2)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_maybe,
        |       CAST(CASE WHEN SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0
        |                 THEN 1 ELSE 0 END AS BIGINT) AS needs_exact
        |FROM hit GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the BATCH words of per-user active-day Bloom filters (m = 63·8
    // bits) — the gate reaches the same cells by folding 3
    // micro-batches through the streaming maintainer (bitwise OR is
    // idempotent: any chunking — and any duplicate delivery — lands
    // here)
    "q254_stream_bloom" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events WHERE event_type = 'click'),
        |h AS (SELECT user_id, md5(CAST(day AS VARCHAR)) AS hx
        |      FROM d WHERE day IS NOT NULL),
        |b AS (SELECT user_id,
        |        ('0x' || substr(hx, 1, 15))::BIGINT % 504 AS h1m,
        |        (('0x' || substr(hx, 16, 15))::BIGINT % 504) * 2 + 1
        |          AS stride
        |      FROM h),
        |p AS (SELECT user_id, (h1m + i * stride) % 504 AS pos
        |      FROM b, UNNEST(range(4)) AS t(i))
        |SELECT user_id, pos // 63 AS slot,
        |       CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT))
        |         AS BIGINT) AS w
        |FROM p GROUP BY user_id, slot
        |ORDER BY user_id, slot""".stripMargin,

    // the identical ±1 projection: the md5-parity sign matrix emitted
    // as VALUES literals (Jl.signsSqlValues — the zValueSql precedent),
    // joined against the unnested quantized components and summed per
    // (vector, output row)
    "q255_jl_project" -> {
      val sv = graft.embed.Jl.signsSqlValues(16, 64)
      s"""WITH s(j, i, sg) AS (VALUES $sv),
         |q AS (SELECT vec_id, i,
         |        CAST(FLOOR(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
         |          * 1000) AS BIGINT) AS qv
         |      FROM embeddings, UNNEST(range(64)) AS t(i)
         |      WHERE embedding IS NOT NULL)
         |SELECT q.vec_id, CAST(s.j AS BIGINT) AS j,
         |       CAST(SUM(s.sg * q.qv) AS BIGINT) AS y
         |FROM q JOIN s ON s.i = q.i
         |GROUP BY q.vec_id, s.j
         |ORDER BY vec_id, j""".stripMargin
    },

    // the full two-stage replay: projection (as q255), per-query top-40
    // shortlist by (d2, cand_id), then the q22 exact-cosine arithmetic
    // on the shortlist only
    "q256_jl_rerank" -> {
      val sv = graft.embed.Jl.signsSqlValues(16, 64)
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |s(j, i, sg) AS (VALUES $sv),
         |comp AS (SELECT vec_id, i, q[CAST(i AS INT) + 1] AS qv
         |         FROM e, UNNEST(range(64)) AS t(i)),
         |y AS (SELECT vec_id, j, SUM(sg * qv) AS y
         |      FROM comp JOIN s ON s.i = comp.i GROUP BY vec_id, j),
         |qy AS (SELECT vec_id AS q_id, j, y FROM y WHERE vec_id < 8),
         |cy AS (SELECT vec_id AS cand_id, j, y FROM y WHERE vec_id >= 8),
         |dd AS (SELECT q_id, cand_id,
         |         SUM((qy.y - cy.y) * (qy.y - cy.y)) AS d2
         |       FROM qy JOIN cy ON qy.j = cy.j GROUP BY q_id, cand_id),
         |short AS (SELECT q_id, cand_id FROM (
         |            SELECT q_id, cand_id, ROW_NUMBER() OVER (
         |              PARTITION BY q_id ORDER BY d2, cand_id) AS srn
         |            FROM dd)
         |          WHERE srn <= 40),
         |qq AS (SELECT vec_id AS q_id,
         |         list_transform(q, x -> CAST(x AS DOUBLE)) AS qv
         |       FROM e WHERE vec_id < 8),
         |cc AS (SELECT vec_id AS cand_id,
         |         list_transform(q, x -> CAST(x AS DOUBLE)) AS cv
         |       FROM e WHERE vec_id >= 8),
         |sc0 AS (SELECT sh.q_id, sh.cand_id,
         |          CAST(list_dot_product(qv, cv) AS BIGINT) AS dot,
         |          CAST(list_dot_product(qv, qv) AS BIGINT) AS qn,
         |          CAST(list_dot_product(cv, cv) AS BIGINT) AS cn
         |        FROM short sh
         |        JOIN qq ON qq.q_id = sh.q_id
         |        JOIN cc ON cc.cand_id = sh.cand_id),
         |sc AS (SELECT q_id, cand_id,
         |         CASE WHEN qn = 0 OR cn = 0 THEN NULL
         |         ELSE CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
         |              / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)))
         |           AS BIGINT) END AS score
         |       FROM sc0 WHERE qn != 0 AND cn != 0)
         |SELECT q_id,
         |  CAST(ROW_NUMBER() OVER (
         |    PARTITION BY q_id ORDER BY score DESC, cand_id) AS BIGINT) AS rn,
         |  cand_id, score
         |FROM sc QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin
    },

    // the q249 replay pattern two-series: per-cohort row-leads of both
    // x and y over the aligned day grid, HUGEINT-exact numerator/
    // denominator factors, and the identical cast/multiply/sqrt/divide
    // chain per lag (negative lags read the y-against-later-x pairing)
    "q257_ccf" -> {
      val v = CENTS.format("value")
      val leadCols = (1 to 5).map(l =>
        s"LEAD(x, $l) OVER (PARTITION BY cohort ORDER BY day) AS lx$l, " +
          s"LEAD(y, $l) OVER (PARTITION BY cohort ORDER BY day) AS ly$l")
        .mkString(", ")
      val aggCols = (1 to 5).map(l =>
        s"COALESCE(SUM(CASE WHEN ly$l IS NOT NULL THEN CAST(x AS HUGEINT) " +
          s"* ly$l END), 0) AS pp$l, " +
        s"COALESCE(SUM(CASE WHEN ly$l IS NOT NULL THEN CAST(x AS HUGEINT) " +
          s"END), 0) AS hx$l, " +
        s"COALESCE(SUM(CAST(ly$l AS HUGEINT)), 0) AS ty$l, " +
        s"COALESCE(SUM(CASE WHEN lx$l IS NOT NULL THEN CAST(y AS HUGEINT) " +
          s"* lx$l END), 0) AS pn$l, " +
        s"COALESCE(SUM(CASE WHEN lx$l IS NOT NULL THEN CAST(y AS HUGEINT) " +
          s"END), 0) AS hy$l, " +
        s"COALESCE(SUM(CAST(lx$l AS HUGEINT)), 0) AS tx$l").mkString(", ")
      val denom = "sqrt(CAST(n*n*qx - n*sx*sx AS DOUBLE) " +
        "* CAST(n*n*qy - n*sy*sy AS DOUBLE))"
      val degenerate = "n*n*qx - n*sx*sx = 0 OR n*n*qy - n*sy*sy = 0"
      val negSelects = (1 to 5).reverse.map(l =>
        s"SELECT cohort, CAST(n AS BIGINT) AS n, CAST(-$l AS BIGINT) AS lag, " +
        s"CASE WHEN $degenerate OR n <= $l THEN NULL ELSE " +
        s"CAST(n*n*pn$l - n*sy*tx$l - n*sx*hy$l + (n - $l)*sx*sy " +
        s"AS DOUBLE) / $denom END AS ccf FROM agg")
      val zeroSelect =
        s"SELECT cohort, CAST(n AS BIGINT) AS n, CAST(0 AS BIGINT) AS lag, " +
        s"CASE WHEN $degenerate THEN NULL ELSE " +
        s"CAST(n*n*p0 - n*sx*sy AS DOUBLE) / $denom END AS ccf FROM agg"
      val posSelects = (1 to 5).map(l =>
        s"SELECT cohort, CAST(n AS BIGINT) AS n, CAST($l AS BIGINT) AS lag, " +
        s"CASE WHEN $degenerate OR n <= $l THEN NULL ELSE " +
        s"CAST(n*n*pp$l - n*sy*hx$l - n*sx*ty$l + (n - $l)*sx*sy " +
        s"AS DOUBLE) / $denom END AS ccf FROM agg")
      val lagSelects = (negSelects ++ Seq(zeroSelect) ++ posSelects)
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT event_type, user_id % 4 AS cohort,
        |    epoch_us(ts) // 86400000000 AS day, $v AS vc
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL AND user_id IS NOT NULL),
        |xs AS (SELECT cohort, day, CAST(SUM(vc) AS BIGINT) AS x FROM e
        |       WHERE event_type = 'click' GROUP BY cohort, day),
        |ys AS (SELECT cohort, day, CAST(SUM(vc) AS BIGINT) AS y FROM e
        |       WHERE event_type = 'purchase' GROUP BY cohort, day),
        |j AS (SELECT xs.cohort, xs.day, xs.x, ys.y
        |      FROM xs JOIN ys USING (cohort, day)),
        |w AS (SELECT cohort, x, y, $leadCols FROM j),
        |agg AS (SELECT cohort, CAST(COUNT(*) AS HUGEINT) AS n,
        |          COALESCE(SUM(CAST(x AS HUGEINT)), 0) AS sx,
        |          COALESCE(SUM(CAST(y AS HUGEINT)), 0) AS sy,
        |          COALESCE(SUM(CAST(x AS HUGEINT) * x), 0) AS qx,
        |          COALESCE(SUM(CAST(y AS HUGEINT) * y), 0) AS qy,
        |          COALESCE(SUM(CAST(x AS HUGEINT) * y), 0) AS p0,
        |          $aggCols
        |        FROM w GROUP BY cohort)
        |$lagSelects
        |ORDER BY cohort, lag""".stripMargin
    },

    // q69's plain-exact decontamination SQL VERBATIM — the gate takes
    // the prefiltered path; the hash match is the soundness proof
    "q258_prefiltered_decontam" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i)),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id % 17 = 0),
        |cont AS (SELECT DISTINCT doc_id FROM g WHERE g IN (SELECT g FROM b))
        |SELECT doc_id, text FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |ORDER BY doc_id""".stripMargin,
  )
}

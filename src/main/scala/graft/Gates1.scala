package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.embed.Similarity
import graft.events.{AsOf, EventOps}
import graft.operators.{GlobalRank, LongMonoid, OrderStats, SlidingAggregate}
import graft.sources.TextKV
import graft.text.{Dedup, Pipeline, SimHash, TextAnalysis}

/** Gate-registry shard 1 (q01–q77): each gate's Spark lambda and
  * its DuckDB oracle SQL side by side — pure relocation of the
  * [[SparkEntry]] registry (r15 verdict #6), no behavior change.
  * [[SparkEntry.queries]] / [[SparkEntry.oracleSql]] assemble the shards.
  */
private[graft] object Gates1 {
  import GateSupport._

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // ── reference op #1: text KV scan (SURVEY §2a #1) ────────────────────
    // Fixed-size smoke query by design: reads the reference's own 103-line
    // fixture (the format has no per-SF testdata), so it does NOT scale with
    // sfDir — it checks format parity, not throughput.
    "q01_text_scan" -> ((s, _) =>
      TextKV.read(s, "/root/reference/input/simple103.txt")
        .orderBy("key", "value")),

    // ── ops #3–#6: sampled range partition + total-order sort ────────────
    // partition count from spark.sql.shuffle.partitions (no hard-coded 8);
    // output is globally ordered for any count — range partitions concatenate
    "q02_total_sort" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"), cents(col("l_extendedprice")).as("price_c"))
        .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")),

    // ── ops #7–#9: global dense ranking (zipWithIndex) ────────────────────
    "q03_global_rank" -> ((s, dir) =>
      GlobalRank.withRank(
        s.read.parquet(t(dir, "orders")).select("o_orderkey"),
        numParts = 0, "rank", col("o_orderkey"))
        .select(col("rank"), col("o_orderkey")).orderBy("rank")),

    // ── op #13: the headline sliding aggregate, all four monoids ─────────
    "q04_sliding_sum"   -> ((s, dir) => slidingOrders(s, dir, 100, LongMonoid.Sum)),
    "q05_sliding_min"   -> ((s, dir) => slidingOrders(s, dir, 100, LongMonoid.Min)),
    "q06_sliding_max"   -> ((s, dir) => slidingOrders(s, dir, 500, LongMonoid.Max)),
    "q07_sliding_count" -> ((s, dir) => slidingOrders(s, dir, 500, LongMonoid.Count)),
    // avg = windowed sum ÷ window count, no second pass (dense ranks make
    // the count min(l, rank+1)); truncating integer division in both engines
    "q51_sliding_avg"   -> ((s, dir) =>
      SlidingAggregate.withAvg(slidingOrders(s, dir, 100, LongMonoid.Sum), 100)),

    // ── op #4: quantile splitter computation (exact order statistics) ────
    // One range shuffle; count + extraction passes reuse its map output
    // (round 1 ran the whole rank pipeline twice — see OrderStats scaladoc).
    "q08_quantile_splitters" -> ((s, dir) =>
      OrderStats.exactSplitters(
        s.read.parquet(t(dir, "lineitem")).select(cents(col("l_extendedprice")).as("key_c")),
        "key_c", k = 8, numParts = 0)),

    // ── op #3: Bernoulli sample (nondeterministic — rows-only check) ─────
    "q09_bernoulli_sample" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem")).select("l_orderkey").sample(0.5, 42L)),

    // ── op #3, deterministic form: hash-Bernoulli sample — membership is a
    // pure function of the row key, so THIS sample variant hash-matches a
    // DuckDB oracle exactly (the seeded .sample() above can only ever get a
    // rows-order-of-magnitude check)
    "q55_hash_sample" -> ((s, dir) =>
      graft.operators.Sampling.byKeyHash(
          s.read.parquet(t(dir, "lineitem")).select("l_orderkey", "l_linenumber"),
          Seq("l_orderkey", "l_linenumber"), num = 1, den = 2)
        .orderBy("l_orderkey", "l_linenumber")),

    // ── deterministic stratified sample: per-stratum hash fractions ──────
    // (training-mix rebalancing: A keeps 1/4, N keeps 1/2, R keeps 3/4)
    "q58_stratified_sample" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedByKeyHash(
          s.read.parquet(t(dir, "lineitem"))
            .select("l_orderkey", "l_linenumber", "l_returnflag"),
          Seq("l_orderkey", "l_linenumber"), "l_returnflag",
          Map("A" -> (1, 4), "N" -> (1, 2), "R" -> (3, 4)))
        .orderBy("l_orderkey", "l_linenumber")),

    // ── ops #10–#12: balanced rank blocks + per-block aggregates ─────────
    // Same single-shuffle pattern: no rank materialization, no second job.
    "q10_block_stats" -> ((s, dir) =>
      OrderStats.blockStats(
        s.read.parquet(t(dir, "orders"))
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("v")),
        "o_orderkey", "v", numBlocks = 8)),

    // ── breadth: standard analytics the engine gets Spark-natively ───────
    "q11_groupby_agg" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_shipdate") < lit("1998-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price_c"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q12_join_revenue" -> ((s, dir) => {
      val orders = s.read.parquet(t(dir, "orders"))
      val customer = s.read.parquet(t(dir, "customer"))
      val nation = s.read.parquet(t(dir, "nation"))
      orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("revenue_c"))
        .orderBy("n_name")
    }),

    "q13_topk" -> ((s, dir) =>
      s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(col("price_c").desc, col("o_orderkey"))
        .limit(20)),

    "q14_distinct" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // Non-vacuous anti-join: customers with no order above 400k (202 rows at
    // sf0.01). Round 1's form anti-joined against ALL orders and matched the
    // oracle on 0 = 0 rows, proving nothing.
    "q15_anti_join" -> ((s, dir) => {
      val customer = s.read.parquet(t(dir, "customer"))
      val bigOrders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_totalprice") > 400000)
      customer.join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),

    "q16_rollup" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "q17_window_partitioned" -> ((s, dir) =>
      s.read.parquet(t(dir, "orders"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          cents(col("o_totalprice")).as("price_c"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
          .cast(LongType))
        .withColumn("prev_price_c", lag("price_c", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")))
        .select("o_custkey", "o_orderkey", "rn", "price_c", "prev_price_c")
        .orderBy("o_custkey", "rn")),

    // ═════ LLM-data-pipeline operators (BASELINE.json north_star) ═════════

    // ── exact dedup: hash-groupBy on normalized bag-of-words fingerprint ─
    // exactHashed = the explicit scale path (16-byte shuffle key); the
    // byte-exact Dedup.exact default produces identical groups (spec-tested)
    "q18_dedup_exact" -> ((s, dir) =>
      Dedup.exactHashed(s.read.parquet(t(dir, "documents")))),

    // ── MinHash signatures (shingle → minhash), the LSH building block ───
    "q19_minhash_sig" -> ((s, dir) =>
      Dedup.minhashSignatures(s.read.parquet(t(dir, "documents")), numHashes = 16)),

    // ── text corpus statistics per language ──────────────────────────────
    "q20_text_stats" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("n_tokens"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")),

    // ── event-time trailing window (reference rank-window → RANGE frame) ─
    "q21_event_window" -> ((s, dir) =>
      EventOps.trailingWindow(s.read.parquet(t(dir, "events")), windowSec = 600)),

    // ── exact top-k cosine over embeddings (ANN baseline) ────────────────
    "q22_topk_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(t(dir, "embeddings"))
      Similarity.topkCosine(emb.filter(col("vec_id") < 5), emb.filter(col("vec_id") >= 5), k = 10)
    }),

    // ── n-gram Jaccard near-dup pairs via inverted-index join ────────────
    // ── n-gram Jaccard dedup: char-3-gram sets. The universe is tiny
    // (≤ charset³), which is exactly the regime where PPJoin prefixes
    // stop filtering — so this gate runs the bitmap small-universe path
    // (native AND+POPCNT kernel); parity with jaccardPairs is spec-tested
    "q56_chargram_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairsBitmapBlocked(s.read.parquet(t(dir, "documents")), num = 4, den = 5,
        tokensOf = graft.text.TextOps.charGrams3Native)),

    "q23_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(s.read.parquet(t(dir, "documents")), num = 19, den = 20)),

    // ── SimHash 32-bit document fingerprints ─────────────────────────────
    "q24_simhash" -> ((s, dir) =>
      SimHash.fingerprints(s.read.parquet(t(dir, "documents")), bits = 32)),

    // ── language-ID scoring (marker-dictionary heuristic) ────────────────
    "q25_lang_id" -> ((s, dir) =>
      TextAnalysis.langIdEnglish(s.read.parquet(t(dir, "documents")),
        markers = Seq("the", "a"), threshold1000 = 50)),

    // ── quality scoring: TTR / word length / stopword ratios ─────────────
    "q26_quality" -> ((s, dir) =>
      TextAnalysis.quality(s.read.parquet(t(dir, "documents")), stopwords = Seq("the", "a"))),

    // ── token counting: whitespace + BPE-ish regex ───────────────────────
    "q27_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(s.read.parquet(t(dir, "documents")))),

    // ── order-sensitive rolling-hash document fingerprint ────────────────
    "q28_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(s.read.parquet(t(dir, "documents")))),

    // ── event sessionization (gap > 30 min ⇒ new session) ────────────────
    "q29_sessions" -> ((s, dir) =>
      EventOps.sessionize(s.read.parquet(t(dir, "events")), gapSec = 1800)),

    // ── embedding near-dup: top-20 closest pairs, label-blocked join ─────
    "q30_closest_pairs" -> ((s, dir) =>
      Similarity.closestPairsBlocked(s.read.parquet(t(dir, "embeddings")), "label", k = 20)),

    // ── embedding near-dup: cosine-threshold pairs (exact verify kernel; ─
    // the LSH-candidate composition embedNearDup is recall-spec-tested)
    "q54_embed_pairs" -> ((s, dir) =>
      Similarity.cosinePairsBlocked(s.read.parquet(t(dir, "embeddings")), "label",
        minScore1e6 = 250000L)),

    // ═════ breadth: remaining standard-analytics surface ═════════════════

    "q31_cube" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("l_quantity"))).as("sum_qty_c"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))),

    "q32_setops" -> ((s, dir) => {
      val hi = s.read.parquet(t(dir, "orders"))
        .filter(col("o_totalprice") > 300000).select(col("o_custkey").as("key")).distinct()
      val lowNat = s.read.parquet(t(dir, "customer"))
        .filter(col("c_nationkey") < 5).select(col("c_custkey").as("key")).distinct()
      lowNat.intersect(hi).withColumn("src", lit("both"))
        .unionByName(lowNat.except(hi).withColumn("src", lit("only_nation")))
        .orderBy("src", "key")
    }),

    "q33_scalar_date" -> ((s, dir) =>
      s.read.parquet(t(dir, "orders"))
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("pr1"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
          length(col("o_orderpriority")).cast(LongType).as("plen"))
        .orderBy("o_orderkey")),

    // from_json with an explicit schema, not get_json_object: the latter
    // re-runs a JsonPath engine per row (~4x slower on this shape)
    "q34_json" -> ((s, dir) =>
      s.read.parquet(t(dir, "events"))
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .orderBy("event_id")),

    "q35_pivot" -> ((s, dir) =>
      s.read.parquet(t(dir, "events"))
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    "q36_window_funcs" -> ((s, dir) => {
      val raw = s.read.parquet(t(dir, "events"))
      val ev = raw.select(col("event_id"), col("user_id"),
          EventOps.tsMicros(raw).as("tus"),
          cents(col("value")).as("v"))
      val byVal = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("v")
      val byTime = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("tus", "event_id")
      ev.select(col("event_id"),
          rank().over(byVal).cast(LongType).as("rnk"),
          dense_rank().over(byVal).cast(LongType).as("drnk"),
          ntile(4).over(byTime).cast(LongType).as("nt"),
          lead("event_id", 1).over(byTime).as("next_id"))
        .orderBy("event_id")
    }),

    // ── dedup end-to-end: similarity join edges → connected components ───
    // (non-vacuous at sf0.01: a 137-doc cluster, 18 pairs, 1 triple).
    // Edges come from the small-universe bitmap form: this corpus' ~31-word
    // vocabulary gives PPJoin prefix filtering nothing rare to index on
    // (same regime call as q56/q74; the two edge paths are spec-proved
    // identical, and the oracle hash-checks the clusters either way) ─────
    "q38_dedup_clusters" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      // big-star/small-star CC (round-8 A/B, PLANS.md): measured faster
      // than the jump rounds at sf0.1 (3.1 vs 4.2 s) and 1.8x at 10x
      // (1.9M edges), identical labels (signature + parity suite)
      Dedup.clustersStars(docs.select("doc_id"),
        Dedup.jaccardPairsBitmapBlocked(docs, num = 19, den = 20)
          .select("doc_a", "doc_b"),
        maxIter = 50)
    }),

    // ── exact distribution statistics: interpolated median per group ─────
    "q39_median" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .groupBy("l_returnflag")
        .agg(median(cents(col("l_quantity"))).as("med_qty_c"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // ── multimodal plumbing over real testdata (text bytes as blobs).
    // Hash-gated on n_bytes (octet_length in DuckDB); the FNV-1a checksum
    // and decode features run in the same pass but are sbt-gated — neither
    // is DuckDB-expressible ───────────────────────────────────────────────
    "q40_multimodal" -> ((s, dir) =>
      graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.fromDocuments(s, t(dir, "documents")))
        .select(col("media_id"), col("n_bytes"))
        .orderBy("media_id")),

    // ── the STREAMING windowed-agg operator, applied in batch mode (Spark
    // unifies the APIs) — 10-min windows sliding by 5, per user ──────────
    "q41_sliding_time_window" -> ((s, dir) => {
      import s.implicits._
      val raw = s.read.parquet(t(dir, "events"))
      val evts = raw
        .select(col("event_id").as("eventId"), col("user_id").as("userId"),
          EventOps.tsMicros(raw).as("tsUs"),
          cents(col("value")).as("valueCents"))
        .as[graft.streaming.EventStreaming.Event]
      graft.streaming.EventStreaming.windowedAgg(evts,
          windowSec = 600, slideSec = 300, watermarkSec = 0)
        .orderBy("userId", "win_start")
    }),

    // ── training-data pipeline staples: reproducible split / normalize /
    // chunk / pack, all deterministic + integer-exact ─────────────────────
    "q44_dataset_split" -> ((s, dir) =>
      graft.text.Pipeline.datasetSplit(s.read.parquet(t(dir, "documents")))),

    "q45_normalize" -> ((s, dir) =>
      graft.text.Pipeline.normalize(s.read.parquet(t(dir, "documents")))),

    "q46_chunking" -> ((s, dir) =>
      graft.text.Pipeline.chunk(s.read.parquet(t(dir, "documents")),
        chunkTokens = 32, overlap = 8)),

    "q47_packing" -> ((s, dir) =>
      graft.text.Pipeline.pack(s.read.parquet(t(dir, "documents")),
        capacityTokens = 512)),

    // ── repetition quality filters: duplicate/top n-gram mass ────────────
    "q60_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(s.read.parquet(t(dir, "documents")))),

    // ── PII scrubbing with redaction counts ──────────────────────────────
    "q61_redact_pii" -> ((s, dir) =>
      Pipeline.redactPii(s.read.parquet(t(dir, "documents")))),

    // ── eval-set decontamination: anti-join on content fingerprints ──────
    // (blocklist = the deterministic doc_id % 17 subset standing in for a
    // benchmark's eval texts; dups of blocklisted docs are dropped too)
    "q57_decontaminate" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      Pipeline.decontaminate(docs, docs.filter(col("doc_id") % 17 === 0))
        .select("doc_id")
    }),

    // ── corpus-LM fluency score: integer-exact perplexity-filter analogue
    "q59_bigram_score" -> ((s, dir) =>
      graft.text.Ngrams.bigramScore(s.read.parquet(t(dir, "documents")))),

    // ── tokenizer-prep vocabulary: counts + distributed frequency rank ───
    "q62_vocab" -> ((s, dir) =>
      graft.text.Ngrams.vocab(s.read.parquet(t(dir, "documents")), minCount = 2)),

    // deterministic epoch upsampling: src0 at 2.5 epochs, src1 at 0.5,
    // everything else passes through once (Pipeline.upsample)
    "q64_upsample" -> ((s, dir) =>
      graft.text.Pipeline.upsample(s.read.parquet(t(dir, "documents")),
          epochs = Map("src0" -> (5, 2), "src1" -> (1, 2)))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")),

    // deterministic training-mixture sampler: 3:1:1 source weights under
    // a 2000-token budget; unweighted sources drop (Pipeline.mixture)
    "q63_mixture" -> ((s, dir) =>
      graft.text.Pipeline.mixture(s.read.parquet(t(dir, "documents")),
          weights = Map("src0" -> 3L, "src1" -> 1L, "src2" -> 1L),
          budgetTokens = 2000L)
        .select(col("doc_id"), col("source")).orderBy("doc_id")),

    // ── 3-table TPC-H-shaped join (Q10 analogue): returned-item revenue
    // per customer over one quarter, top 20. Exercises multi-join ordering
    // at gate level: lineitem⋈orders shuffles on the orderkey (both sides
    // large at scale), customer arrives by broadcast (Catalyst picks it —
    // dimension under the auto-broadcast threshold; at 100 TB AQE would
    // make the same call from runtime stats or degrade to SMJ). Filters
    // (quarter + returnflag) sit under the joins → pushed to the scans.
    "q65_return_revenue" -> ((s, dir) => {
      val lineitem = s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_returnflag") === "R")
      val orders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderdate") >= lit("1996-04-01").cast(TimestampType) &&
                col("o_orderdate") <  lit("1996-07-01").cast(TimestampType))
      val customer = s.read.parquet(t(dir, "customer"))
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_c").desc, col("c_custkey"))
        .limit(20)
    }),

    // ── deterministic subword (BPE-style) tokenization: greedy longest-
    // match over the checked-in vocab, as one native codegen'd pass
    // (functions.BpeTokens); n_bpe is what chunk/pack/mixture size by
    // when budgeting subword tokens instead of whitespace words
    "q66_bpe_tokens" -> ((s, dir) =>
      graft.text.Bpe.tokenize(s.read.parquet(t(dir, "documents")))),

    // ── 6-table TPC-H-shaped join (Q5 analogue): nation revenue where the
    // customer and the line's supplier share a nation, over a 2-year
    // window. The co-location predicate (c_nationkey = s_nationkey) rides
    // the supplier join — the planner's multi-join ordering problem in
    // miniature: lineitem⋈orders carries the date pushdown, supplier/
    // nation/region broadcast, the extra equality prunes 96% of pairs
    // before the aggregate.
    "q68_local_supplier_revenue" -> ((s, dir) => {
      val customer = s.read.parquet(t(dir, "customer"))
      val orders = s.read.parquet(t(dir, "orders"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("o_orderdate") <  lit("1998-01-01").cast(TimestampType))
      val lineitem = s.read.parquet(t(dir, "lineitem"))
      val supplier = s.read.parquet(t(dir, "supplier"))
      val nation = s.read.parquet(t(dir, "nation"))
      val region = s.read.parquet(t(dir, "region"))
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey") &&
          customer("c_nationkey") === supplier("s_nationkey"))
        .join(nation, supplier("s_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue_c").desc, col("n_name"))
    }),

    // ── BPE merge learning's round-1 core: adjacent character-pair
    // counts over the corpus DICTIONARY (word-frequency-weighted) — the
    // distributed computation every Bpe.learn round repeats on merged
    // symbols; top 20 under a total order (count desc, pair asc)
    "q67_bpe_pair_counts" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), expr(
          """CASE WHEN length(w) >= 2 THEN
            |  transform(sequence(1, length(w) - 1),
            |    i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))
            |ELSE array() END""".stripMargin).as("ps"))
        .select(explode(col("ps")).as("p"), col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(20)),

    // ── n-gram-overlap decontamination (GPT-3-style span collision):
    // drops every doc sharing ANY word 4-gram with the doc_id % 17
    // blocklist — catches eval text EMBEDDED in novel wrappers, which
    // q57's whole-doc fingerprint misses ─────────────────────────────────
    "q69_ngram_decontaminate" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      graft.text.Pipeline.decontaminateNgrams(
        docs, docs.filter(col("doc_id") % 17 === 0), n = 4)
    }),

    // ── duplicated-n-gram fraction (cross-corpus span duplication — the
    // web-pipeline quality signal; q60 is the intra-doc cousin) ──────────
    "q70_dup_ngram_stats" -> ((s, dir) =>
      TextAnalysis.duplicatedNgramStats(
        s.read.parquet(t(dir, "documents")), n = 4)),

    // ── per-vector symmetric int8 embedding quantization (the ANN
    // storage/bandwidth scale path; exploded to scalar rows so the gate
    // hash-checks every component) ───────────────────────────────────────
    "q71_quantize_int8" -> ((s, dir) =>
      graft.embed.Similarity.quantizeInt8(s.read.parquet(t(dir, "embeddings")))
        .select(col("vec_id"), col("scale"), posexplode(col("q8")).as(Seq("i", "qv")))
        .orderBy("vec_id", "i")),

    // ── exact heavy hitters via mergeable Misra-Gries + candidate
    // recount: terms holding ≥ 1/64 of corpus mass, WITHOUT a
    // full-vocabulary shuffle (the scale path beside q62's exact vocab) ──
    "q72_heavy_hitters" -> ((s, dir) =>
      graft.operators.HeavyHitters.frequentTerms(
        s.read.parquet(t(dir, "documents")), den = 64)),

    // ── deterministic global training-order shuffle: reproducible
    // hash-permutation rank (epoch salt "order"), computed with the
    // distributed GlobalRank machinery — no single-task window, no
    // seeded rand() ──────────────────────────────────────────────────────
    "q73_training_order" -> ((s, dir) =>
      graft.text.Pipeline.trainingOrder(
          s.read.parquet(t(dir, "documents")).select("doc_id", "text"))
        .orderBy("rank")),

    // ── asymmetric set-CONTAINMENT join (quote/subset detection): ordered
    // pairs where ≥ 98% of A's token set lies inside B's — the dedup
    // relation Jaccard misses (a short doc pasted into a long one). The
    // gate runs the small-universe bitmap form BLOCKED BY LANGUAGE (the
    // documented composition: this corpus' ~31-word vocab gives prefix
    // filtering nothing rare to bite on, and its subset relation is so
    // dense that the unblocked output itself is ~9% of n² — blocking is
    // how the operator is actually deployed; the PPJoin form
    // containmentPairs is the big-vocabulary path, spec-proved identical
    // on unblocked corpora) ──────────────────────────────────────────────
    "q74_containment_pairs" -> ((s, dir) =>
      Dedup.containmentPairsBitmap(s.read.parquet(t(dir, "documents")),
        num = 49, den = 50, blockCol = Some("lang"))),

    // ── source-balanced deterministic interleave: every prefix of the
    // training order holds each source in proportion (±1) — the
    // low-discrepancy epoch schedule (q73 is the plain hash shuffle) ─────
    "q75_interleave_by_source" -> ((s, dir) =>
      graft.text.Pipeline.interleaveBySource(
          s.read.parquet(t(dir, "documents")).select("doc_id", "source"))
        .orderBy("pos")),

    // ── skew-salted join: the hot-key mitigation must be RESULT-invisible
    // — the oracle is the plain join it replaces (orders⋈lineitem revenue
    // per order, o_orderkey the salted key) ──────────────────────────────
    // ── grouped EXACT order statistics (per-language median + p90 doc
    // length): the small-group exact path — per-group collect is O(group)
    // memory, the right call at thousands-per-group; a group outgrowing
    // memory graduates to the OrderStats range-shuffle machinery (q08/
    // q39's global forms). Integer indexing, no interpolation — engines
    // disagree on interpolated quantile FP order, not on order statistics ─
    "q77_grouped_quantiles" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        // NULL n_chars dropped identically in both engines BEFORE the
        // group: Spark's collect_list skips NULLs while DuckDB's list()
        // keeps them, and count(*) vs the list length would index
        // different elements — the symmetric WHERE removes the divergence
        .filter(col("n_chars").isNotNull)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sort_array(collect_list(col("n_chars"))).as("xs"))
        .select(col("lang"), col("n_docs"),
          element_at(col("xs"), expr("CAST((n_docs + 1) div 2 AS INT)")).as("median_chars"),
          element_at(col("xs"), expr("CAST((9 * n_docs + 9) div 10 AS INT)")).as("p90_chars"))
        .orderBy("lang")),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q01_text_scan" ->
      """SELECT * FROM read_csv('/root/reference/input/simple103.txt',
        |  delim=chr(9), header=false, columns={'key':'INTEGER','value':'INTEGER'})
        |ORDER BY key, value""".stripMargin,

    "q02_total_sort" ->
      s"""SELECT l_orderkey, l_linenumber, ${CENTS.format("l_extendedprice")} AS price_c
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_global_rank" ->
      """SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey)) - 1 AS rank, o_orderkey
        |FROM orders ORDER BY rank""".stripMargin,

    "q04_sliding_sum"   -> slidingOrdersSql(100, "SUM"),
    "q05_sliding_min"   -> slidingOrdersSql(100, "MIN"),
    "q06_sliding_max"   -> slidingOrdersSql(500, "MAX"),
    "q07_sliding_count" -> slidingOrdersSql(500, "count"),

    // avg: windowed SUM ÷ min(l, rank+1); // is floor division — identical
    // to Spark's truncating `div` here because the summands are positive
    "q51_sliding_avg" ->
      s"""SELECT rank, key, CAST(s // LEAST(100, rank + 1) AS BIGINT) AS agg
         |FROM (SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey)) - 1 AS rank,
         |             CAST(o_orderkey AS BIGINT) AS key,
         |             CAST(SUM(${CENTS.format("o_totalprice")}) OVER
         |               (ORDER BY o_orderkey ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
         |               AS BIGINT) AS s
         |      FROM orders) ORDER BY rank""".stripMargin,

    "q08_quantile_splitters" ->
      s"""WITH ranked AS (
         |  SELECT ${CENTS.format("l_extendedprice")} AS key_c,
         |         (ROW_NUMBER() OVER (ORDER BY ${CENTS.format("l_extendedprice")})) - 1 AS rn
         |  FROM lineitem),
         |n AS (SELECT COUNT(*) AS n FROM lineitem),
         |ids AS (SELECT UNNEST(range(1, 8)) AS splitter_id)
         |SELECT ids.splitter_id, ranked.key_c AS splitter
         |FROM ids CROSS JOIN n
         |JOIN ranked ON ranked.rn = (ids.splitter_id * n.n) // 8
         |ORDER BY ids.splitter_id""".stripMargin,

    // Sampling.compositeKey joins with the U+0001 separator (invisible in
    // this comment) ≡ DuckDB's || chr(1) ||; both engines render integer
    // keys as plain decimal strings before hashing. The operator's NULL
    // sentinel (U+0002) never fires here — lineitem keys are non-null —
    // while the oracle's || would NULL-propagate, so the forms agree.
    "q55_hash_sample" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE ('0x' || substr(md5(
        |         CAST(l_orderkey AS VARCHAR) || chr(1) || CAST(l_linenumber AS VARCHAR)
        |       ), 1, 15))::BIGINT % 2 < 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q58_stratified_sample" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE ('0x' || substr(md5(
        |         CAST(l_orderkey AS VARCHAR) || chr(1) || CAST(l_linenumber AS VARCHAR)
        |       ), 1, 15))::BIGINT
        |      % (CASE l_returnflag WHEN 'A' THEN 4 WHEN 'N' THEN 2
        |                           WHEN 'R' THEN 4 ELSE 1 END)
        |      < (CASE l_returnflag WHEN 'A' THEN 1 WHEN 'N' THEN 1
        |                           WHEN 'R' THEN 3 ELSE 0 END)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // All DuckDB SUMs below are CAST to BIGINT: DuckDB's SUM(BIGINT) returns
    // HUGEINT (int128), which hash-mismatches Spark's BIGINT even when the
    // values are identical (round-1 q10/q11/q12/q16 failure mode).
    "q10_block_stats" ->
      s"""WITH ranked AS (
         |  SELECT (ROW_NUMBER() OVER (ORDER BY o_orderkey)) - 1 AS rank,
         |         ${CENTS.format("o_totalprice")} AS v
         |  FROM orders),
         |n AS (SELECT CAST(CEIL(COUNT(*) / 8.0) AS BIGINT) AS m FROM orders)
         |SELECT rank // m AS block, COUNT(*) AS cnt, CAST(SUM(v) AS BIGINT) AS sum_c
         |FROM ranked, n GROUP BY 1 ORDER BY block""".stripMargin,

    "q11_groupby_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${CENTS.format("l_quantity")}) AS BIGINT) AS sum_qty_c,
         |  CAST(SUM(${CENTS.format("l_extendedprice")}) AS BIGINT) AS sum_price_c,
         |  CAST(SUM(${CENTS.format("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_price_c,
         |  COUNT(*) AS cnt
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q12_join_revenue" ->
      s"""SELECT n_name, COUNT(*) AS n_orders, CAST(SUM(${CENTS.format("o_totalprice")}) AS BIGINT) AS revenue_c
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q13_topk" ->
      s"""SELECT o_orderkey, ${CENTS.format("o_totalprice")} AS price_c
         |FROM orders ORDER BY price_c DESC, o_orderkey LIMIT 20""".stripMargin,

    "q14_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // NOT EXISTS (not NOT IN): left_anti keeps rows when the probe side has a
    // NULL key; NOT IN returns zero rows then — semantics diverge.
    "q15_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q16_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  CAST(SUM(${CENTS.format("l_quantity")}) AS BIGINT) AS sum_qty_c
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q17_window_partitioned" ->
      s"""SELECT o_custkey, o_orderkey,
         |  ROW_NUMBER() OVER w AS rn,
         |  ${CENTS.format("o_totalprice")} AS price_c,
         |  LAG(${CENTS.format("o_totalprice")}, 1) OVER w AS prev_price_c
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         |ORDER BY o_custkey, rn""".stripMargin,

    // ═════ LLM-pipeline oracles. Shared determinism devices: the
    // cross-engine hash  ('0x'||substr(md5(s),1,15))::BIGINT  ≡ Spark's
    // conv(substring(md5(s),1,15),16,10); integer-quantized embeddings
    // (exact dot products in any summation order); µs-floored timestamps
    // (DuckDB's parquet reader truncates ns to µs). ═════════════════════

    "q18_dedup_exact" ->
      """SELECT MIN(doc_id) AS rep_doc, COUNT(*) AS dup_cnt
        |FROM (SELECT doc_id,
        |        array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp
        |      FROM documents)
        |GROUP BY fp ORDER BY rep_doc""".stripMargin,

    "q19_minhash_sig" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM toks, UNNEST(range(1, len(ws)-1)) AS t(i)),
        |hs AS (SELECT doc_id, ('0x' || substr(md5(s),1,15))::BIGINT % 1000000007 AS h FROM sh),
        |hf AS (SELECT i, (2654435761 * (i+1)) % 1000000007 AS a,
        |              (40503 * (i+1)) % 1000000007 AS b
        |       FROM (SELECT UNNEST(range(16)) AS i))
        |SELECT doc_id, i, MIN((a*h + b) % 1000000007) AS minhash
        |FROM hs CROSS JOIN hf GROUP BY doc_id, i ORDER BY doc_id, i""".stripMargin,

    "q20_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q21_event_window" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(v) OVER w AS BIGINT) AS win_sum_c,
        |  COUNT(*) OVER w AS win_cnt
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q22_topk_cosine" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, vd AS qv FROM e WHERE vec_id < 5),
        |c AS (SELECT vec_id AS cand_id, vd AS cv FROM e WHERE vec_id >= 5),
        |s AS (SELECT q_id, cand_id,
        |        CAST(list_dot_product(qv, cv) AS BIGINT) AS dot,
        |        CAST(list_dot_product(qv, qv) AS BIGINT) AS qn,
        |        CAST(list_dot_product(cv, cv) AS BIGINT) AS cn
        |      FROM q CROSS JOIN c),
        |sc AS (SELECT q_id, cand_id,
        |         CASE WHEN qn = 0 OR cn = 0 THEN NULL
        |         ELSE CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |              / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) END AS score
        |       FROM s WHERE qn != 0 AND cn != 0)
        |SELECT q_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, cand_id) AS BIGINT) AS rn,
        |  cand_id, score
        |FROM sc
        |QUALIFY rn <= 10 ORDER BY q_id, rn""".stripMargin,

    // len(s) > 0 guard: docs under 3 chars have EMPTY char-gram sets and
    // never enter the Spark-side inverted index; without the guard two
    // empty-set docs would satisfy 0*5 >= 0*4 in the oracle only
    "q56_chargram_jaccard" ->
      """WITH g AS (SELECT doc_id,
        |    CASE WHEN length(text) >= 3 THEN
        |      list_distinct(list_transform(range(1, length(text) - 1),
        |        i -> substr(text, CAST(i AS INT), 3)))
        |    ELSE [] END AS s
        |  FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_cnt,
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS union_cnt
        |      FROM g a JOIN g b ON a.doc_id < b.doc_id
        |        AND len(a.s) > 0 AND len(b.s) > 0)
        |SELECT doc_a, doc_b, inter_cnt, union_cnt FROM p
        |WHERE inter_cnt * 5 >= union_cnt * 4 ORDER BY doc_a, doc_b""".stripMargin,

    "q23_jaccard_pairs" ->
      """WITH ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_cnt,
        |        CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS union_cnt
        |      FROM ws a JOIN ws b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, inter_cnt, union_cnt FROM p
        |WHERE inter_cnt * 20 >= union_cnt * 19 ORDER BY doc_a, doc_b""".stripMargin,

    "q24_simhash" ->
      """WITH tok AS (SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(w),1,15))::BIGINT AS h FROM tok),
        |bb AS (SELECT UNNEST(range(32)) AS b),
        |v AS (SELECT doc_id, b, CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END AS c
        |      FROM h CROSS JOIN bb),
        |s AS (SELECT doc_id, b, SUM(c) AS sb FROM v GROUP BY doc_id, b)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN sb > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q25_lang_id" ->
      """SELECT doc_id, en_cnt, n_tokens,
        |  CAST(en_cnt * 1000 // n_tokens AS BIGINT) AS score1000,
        |  CASE WHEN en_cnt * 1000 // n_tokens >= 50 THEN 'en' ELSE 'unk' END AS pred
        |FROM (SELECT doc_id,
        |        CAST(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a')) AS BIGINT) AS en_cnt,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q26_quality" ->
      """SELECT doc_id, n_tokens, n_distinct, n_chars, stop_cnt,
        |  ttr1000, awl1000, stop1000,
        |  CAST((2 * ttr1000 + (1000 - stop1000)) // 3 AS BIGINT) AS quality
        |FROM (SELECT doc_id, n_tokens, n_distinct, n_chars, stop_cnt,
        |        CAST(n_distinct * 1000 // n_tokens AS BIGINT) AS ttr1000,
        |        CAST((n_chars - n_tokens + 1) * 1000 // n_tokens AS BIGINT) AS awl1000,
        |        CAST(stop_cnt * 1000 // n_tokens AS BIGINT) AS stop1000
        |      FROM (SELECT doc_id,
        |              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |              CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |              CAST(length(text) AS BIGINT) AS n_chars,
        |              CAST(len(list_filter(string_split(text, ' '),
        |                w -> w = 'the' OR w = 'a')) AS BIGINT) AS stop_cnt
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q27_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q28_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        w -> ('0x' || substr(md5(w),1,15))::BIGINT % 1000000007)),
        |    (acc, x) -> (acc * 131 + x) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q29_sessions" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
        |g AS (SELECT event_id, user_id, tus,
        |        CASE WHEN LAG(tus) OVER w IS NULL
        |               OR tus - LAG(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        |      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT event_id, user_id,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM g ORDER BY event_id""".stripMargin,

    "q30_closest_pairs" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS vid_a, b.vec_id AS vid_b, a.label AS label,
        |        CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS dot,
        |        CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS qn,
        |        CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS cn
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT vid_a, vid_b, label,
        |  CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |       / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) AS score
        |FROM p WHERE qn != 0 AND cn != 0
        |ORDER BY score DESC, vid_a, vid_b LIMIT 20""".stripMargin,

    "q54_embed_pairs" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |      x -> CAST(x AS DOUBLE)) AS vd
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS vid_a, b.vec_id AS vid_b, a.label AS label,
        |        CAST(list_dot_product(a.vd, b.vd) AS BIGINT) AS dot,
        |        CAST(list_dot_product(a.vd, a.vd) AS BIGINT) AS qn,
        |        CAST(list_dot_product(b.vd, b.vd) AS BIGINT) AS cn
        |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
        |sc AS (SELECT vid_a, vid_b, label,
        |         CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
        |              / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE))) AS BIGINT) AS score
        |       FROM p WHERE qn != 0 AND cn != 0)
        |SELECT vid_a, vid_b, label, score FROM sc
        |WHERE score >= 250000 ORDER BY vid_a, vid_b""".stripMargin,

    "q31_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  CAST(SUM(${CENTS.format("l_quantity")}) AS BIGINT) AS sum_qty_c
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q32_setops" ->
      """SELECT key, 'both' AS src FROM (
        |  SELECT c_custkey AS key FROM customer WHERE c_nationkey < 5
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |UNION ALL
        |SELECT key, 'only_nation' AS src FROM (
        |  SELECT c_custkey AS key FROM customer WHERE c_nationkey < 5
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY src, key""".stripMargin,

    "q33_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  upper(substr(o_orderpriority, 1, 1)) AS pr1,
        |  o_orderstatus || '-' || o_orderpriority AS tag,
        |  CAST(length(o_orderpriority) AS BIGINT) AS plen
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q34_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q35_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q36_window_funcs" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events)
        |SELECT event_id,
        |  CAST(RANK() OVER wv AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER wv AS BIGINT) AS drnk,
        |  CAST(NTILE(4) OVER wt AS BIGINT) AS nt,
        |  LEAD(event_id, 1) OVER wt AS next_id
        |FROM ev
        |WINDOW wv AS (PARTITION BY user_id ORDER BY v),
        |       wt AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY event_id""".stripMargin,

    // CC oracle: transitive closure as a recursive CTE (UNION dedups, so it
    // terminates), then min reachable doc per source
    "q38_dedup_clusters" ->
      """WITH RECURSIVE
        |ws AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS s FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |      FROM ws a JOIN ws b ON a.doc_id < b.doc_id
        |      WHERE CAST(len(list_intersect(a.s, b.s)) AS BIGINT) * 20 >=
        |            CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) * 19),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION ALL SELECT doc_b, doc_a FROM p),
        |reach(s, d) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.s, e.b FROM reach r JOIN e ON r.d = e.a)
        |SELECT s AS doc_id, MIN(d) AS cluster FROM reach GROUP BY s ORDER BY doc_id""".stripMargin,

    "q39_median" ->
      s"""SELECT l_returnflag, median(${CENTS.format("l_quantity")}) AS med_qty_c,
         |  COUNT(*) AS cnt
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // coalesce: extractFeatures degrades a NULL blob to empty bytes
    // (n_bytes 0), while octet_length would NULL-propagate — keep the
    // engines aligned on the degrade contract even for NULL-text rows
    "q40_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CAST(coalesce(octet_length(encode(text)), 0) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY media_id""".stripMargin,

    // sliding event-time windows: event t belongs to the 2 windows with
    // start = (t div slide - i)*slide, i in {0,1}, start <= t < start+window
    "q41_sliding_time_window" ->
      """WITH ev AS (SELECT user_id AS userId, epoch_us(ts) AS tus,
        |              CAST(FLOOR(value * 100) AS BIGINT) AS v FROM events),
        |w AS (SELECT userId, v,
        |        ((tus // 300000000) - i) * 300000000 AS start_us
        |      FROM ev, UNNEST(range(2)) AS t(i)
        |      WHERE ((tus // 300000000) - i) * 300000000 <= tus
        |        AND tus < ((tus // 300000000) - i) * 300000000 + 600000000)
        |SELECT userId, make_timestamp(start_us) AS win_start,
        |  make_timestamp(start_us + 600000000) AS win_end,
        |  CAST(SUM(v) AS BIGINT) AS sum_c, COUNT(*) AS cnt
        |FROM w GROUP BY userId, start_us ORDER BY userId, win_start""".stripMargin,

    // coalesce mirrors the Spark side: NULL text hashes as '' (content
    // rule), not CASE-fallthrough into 'test'
    "q44_dataset_split" ->
      """SELECT doc_id,
        |  (('0x' || substr(md5(coalesce(text, '')),1,15))::BIGINT % 1000000007) % 10 AS bucket,
        |  CASE WHEN (('0x' || substr(md5(coalesce(text, '')),1,15))::BIGINT % 1000000007) % 10 < 8 THEN 'train'
        |       WHEN (('0x' || substr(md5(coalesce(text, '')),1,15))::BIGINT % 1000000007) % 10 < 9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) AS norm_text,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |       ' +', ' ', 'g')) <> text AS changed
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the i = 0 OR i < len - overlap guard mirrors the Spark side's
    // redundant-trailing-chunk cut (a start past len - overlap re-emits
    // text its predecessor already covered)
    "q46_chunking" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws, i AS start,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) AS chunk_idx
        |       FROM toks, UNNEST(range(0, len(ws), 24)) AS t(i)
        |       WHERE i = 0 OR i < len(ws) - 8)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(ws[start+1 : start+32]) AS BIGINT) AS n_tokens,
        |  array_to_string(ws[start+1 : start+32], ' ') AS chunk_text
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    "q47_packing" ->
      """WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM d)
        |SELECT doc_id, n_tokens, CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "q60_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM toks, UNNEST(range(1, len(ws))) AS t(i)
        |       WHERE len(ws) >= 2),
        |per AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total,
        |  CAST(1000 * (SUM(c) - COUNT(*)) // SUM(c) AS BIGINT) AS dup_frac1000,
        |  CAST(1000 * MAX(c) // SUM(c) AS BIGINT) AS top_frac1000
        |FROM per GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // DuckDB regexp_replace is first-match by default — the 'g' flag makes
    // it global like Spark's; both dialects (Java regex / RE2) agree on
    // these conservative character-class patterns
    "q61_redact_pii" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', '<PHONE>', 'g') AS red_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q57_decontaminate" ->
      """WITH f AS (SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS fp
        |  FROM documents),
        |b AS (SELECT fp FROM f WHERE doc_id % 17 = 0)
        |SELECT doc_id FROM f WHERE fp NOT IN (SELECT fp FROM b)
        |ORDER BY doc_id""".stripMargin,

    "q59_bigram_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |      FROM toks, UNNEST(range(1, len(ws))) AS t(i)
        |      WHERE len(ws) >= 2),
        |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM p GROUP BY w1, w2),
        |head AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(c12 * 1000 // c1) // COUNT(*) AS BIGINT) AS lm_score1000
        |FROM p JOIN big USING (w1, w2) JOIN head USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q62_vocab" ->
      """WITH c AS (SELECT t AS token, COUNT(*) AS cnt
        |           FROM (SELECT UNNEST(string_split(text, ' ')) AS t FROM documents)
        |           GROUP BY t HAVING COUNT(*) >= 2)
        |SELECT token, cnt,
        |  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        |FROM c ORDER BY rank""".stripMargin,

    // mirrors Pipeline.upsample: ⌊num/den⌋ full epochs + one fractional
    // epoch decided by q55's md5 key-hash rule under the 'epoch' salt
    // (salt || chr(1) || key — the salted composite-key encoding);
    // range(n) is empty for n <= 0, matching the guarded sequence
    "q64_upsample" ->
      """WITH c AS (SELECT doc_id, source,
        |         CASE source
        |           WHEN 'src0' THEN 2 + CASE WHEN ('0x'||substr(md5('epoch' || chr(1) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 2 < 1 THEN 1 ELSE 0 END
        |           WHEN 'src1' THEN 0 + CASE WHEN ('0x'||substr(md5('epoch' || chr(1) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 2 < 1 THEN 1 ELSE 0 END
        |           ELSE 1 END AS copies
        |       FROM documents)
        |SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
        |FROM c, UNNEST(range(copies)) AS t(e)
        |ORDER BY doc_id, epoch""".stripMargin,

    // mirrors Pipeline.mixture exactly: per-source available tokens →
    // integer keep-numerator min(den, den·budget·w / (Σw·avail)) (HUGEINT
    // // ≡ BigInt floor-div on positives) → q55's md5 key-hash rule.
    // Sources outside the weight table (and NULL sources) drop.
    "q63_mixture" ->
      """WITH av AS (SELECT source, SUM(CAST(len(string_split(text,' ')) AS BIGINT)) AS a
        |            FROM documents GROUP BY source),
        |w(source, wt) AS (VALUES ('src0', 3), ('src1', 1), ('src2', 1)),
        |nm AS (SELECT av.source,
        |         LEAST(1000000, (1000000::HUGEINT * 2000 * wt) // (5::HUGEINT * av.a)) AS num
        |       FROM av JOIN w USING (source))
        |SELECT d.doc_id, d.source FROM documents d JOIN nm ON d.source = nm.source
        |WHERE ('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 1000000 < nm.num
        |ORDER BY d.doc_id""".stripMargin,

    "q65_return_revenue" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(SUM(${CENTS.format("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-04-01'
         |  AND o_orderdate <  TIMESTAMP '1996-07-01'
         |GROUP BY c_custkey, c_name
         |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin,

    // mirrors Bpe.tokenize: the recursive CTE walks each word left to
    // right, at every cursor taking the LONGEST vocab entry matching
    // there (unique — equal-length matches of one prefix are the same
    // string) with the single character as the OOV fallback — exactly
    // functions.BpeTokens' greedy loop. Words come from single-space
    // splits (the corpus has no other whitespace; the engine's contract
    // covers all ASCII whitespace and is spec-gated beyond the oracle).
    "q66_bpe_tokens" ->
      s"""WITH RECURSIVE vocab(tok) AS (
         |  SELECT unnest(${graft.text.Bpe.vocabSql.replace("array(", "[").replace(")", "]")})
         |),
         |words AS (
         |  SELECT doc_id, i AS word_id, ws[i] AS word
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |       unnest(generate_series(1, len(ws))) AS t(i)
         |  WHERE length(ws[i]) > 0
         |),
         |steps(doc_id, word_id, word, pos, tok) AS (
         |  SELECT doc_id, word_id, word, 1, CAST(NULL AS VARCHAR) FROM words
         |  UNION ALL
         |  SELECT doc_id, word_id, word, pos + length(tok2), tok2 FROM (
         |    SELECT doc_id, word_id, word, pos,
         |      coalesce(
         |        (SELECT v.tok FROM vocab v
         |         WHERE length(v.tok) >= 2
         |           AND substr(word, pos, length(v.tok)) = v.tok
         |         ORDER BY length(v.tok) DESC LIMIT 1),
         |        substr(word, pos, 1)) AS tok2
         |    FROM steps WHERE pos <= length(word))
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bpe,
         |       string_agg(tok, ' ' ORDER BY word_id, pos) AS bpe_text
         |FROM steps WHERE tok IS NOT NULL
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q68_local_supplier_revenue" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM(${CENTS.format("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c,
         |  COUNT(*) AS n_items
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY r_name, n_name
         |ORDER BY revenue_c DESC, n_name""".stripMargin,

    "q67_bpe_pair_counts" ->
      """WITH w AS (
        |  SELECT ws[i] AS w, COUNT(*) AS cnt
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents),
        |       unnest(generate_series(1, len(ws))) AS t(i)
        |  WHERE length(ws[i]) > 0
        |  GROUP BY 1
        |), p AS (
        |  SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, SUM(cnt) AS c
        |  FROM w, unnest(generate_series(1, length(w) - 1)) AS t(i)
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, CAST(c AS BIGINT) AS c FROM p
        |ORDER BY c DESC, a, b LIMIT 20""".stripMargin,

    // mirrors Pipeline.decontaminateNgrams at n=4: ws[i:i+3] is DuckDB's
    // 1-based INCLUSIVE list slice (4 elements); range(1, len-2) is
    // empty for docs under 4 tokens, matching the guarded sequence
    "q69_ngram_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i)),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id % 17 = 0),
        |cont AS (SELECT DISTINCT doc_id FROM g WHERE g IN (SELECT g FROM b))
        |SELECT doc_id, text FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
        |ORDER BY doc_id""".stripMargin,

    // mirrors TextAnalysis.duplicatedNgramStats at n=4: per-(gram, doc)
    // occurrence counts, global totals, per-doc roll-up; gramless docs
    // report zeros via the LEFT JOIN
    "q70_dup_ngram_stats" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS g
        |      FROM toks, UNNEST(range(1, len(ws) - 2)) AS t(i)),
        |pd AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY 1, 2),
        |gl AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS tot FROM pd GROUP BY 1),
        |st AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |              CAST(sum(CASE WHEN tot > 1 THEN cnt ELSE 0 END) AS BIGINT) AS n_dup_grams
        |       FROM pd JOIN gl USING (g) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
        |       coalesce(n_dup_grams, 0) AS n_dup_grams,
        |       CASE WHEN coalesce(n_grams, 0) = 0 THEN 0
        |            ELSE (1000 * n_dup_grams) // n_grams END AS dup_permille
        |FROM documents d LEFT JOIN st USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // mirrors Similarity.quantizeInt8: the SAME three IEEE double ops
    // (mul, div, add-half, floor) — round() would diverge across engines.
    // DuckDB double→INT CAST rounds, but floor() already made it integral.
    "q71_quantize_int8" ->
      """WITH s AS (SELECT vec_id, embedding,
        |    CAST(list_aggregate(list_transform(embedding, x -> abs(x)), 'max') AS DOUBLE) AS scale
        |  FROM embeddings)
        |SELECT vec_id, scale, ii - 1 AS i,
        |  CASE WHEN scale = 0 THEN 0
        |       ELSE CAST(floor(CAST(embedding[ii] AS DOUBLE) * 127.0 / scale + 0.5) AS INT) END AS qv
        |FROM s, UNNEST(generate_series(1, len(embedding))) AS t(ii)
        |ORDER BY vec_id, i""".stripMargin,

    // mirrors HeavyHitters.frequentTerms(den=64): terms with count ≥
    // max(1, totalTokens // 64) — the oracle is the EXACT full group-by
    // the operator's MG-candidates + recount must reproduce
    "q72_heavy_hitters" ->
      """WITH t AS (SELECT UNNEST(string_split(text, ' ')) AS term FROM documents),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT term, count(*) AS cnt FROM t GROUP BY term
        |HAVING count(*) >= GREATEST(1, (SELECT n // 64 FROM n))
        |ORDER BY term""".stripMargin,

    // mirrors Pipeline.trainingOrder: q55's md5 key-hash rule under the
    // 'order' salt (salt || chr(1) || key), rank 0-based, hash ties
    // break on doc_id
    "q73_training_order" ->
      """WITH h AS (SELECT doc_id,
        |    ('0x' || substr(md5('order' || chr(1) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
        |  FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS rank, doc_id
        |FROM h ORDER BY rank""".stripMargin,

    // mirrors Dedup.containmentPairsBitmap(49/50, block = lang): ORDERED
    // pairs (a ≠ b) WITHIN a language block, threshold on |A∩B|/|A| only
    // — the quadratic oracle the banded equi-keyed join must reproduce
    "q74_containment_pairs" ->
      """WITH ws AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS s
        |            FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |        CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_cnt,
        |        CAST(len(a.s) AS BIGINT) AS na_cnt
        |      FROM ws a JOIN ws b ON a.doc_id <> b.doc_id AND a.lang = b.lang)
        |SELECT doc_a, doc_b, inter_cnt, na_cnt FROM p
        |WHERE inter_cnt * 50 >= na_cnt * 49 ORDER BY doc_a, doc_b""".stripMargin,

    // mirrors Pipeline.interleaveBySource: within-source rank r by the
    // salted md5 key-hash rule, fraction (2r+1)/(2·n_s) as ONE exact
    // integer-to-double divide, ties (equal-size sources) on (source, r)
    "q75_interleave_by_source" ->
      """WITH h AS (SELECT doc_id, source,
        |    ('0x' || substr(md5('interleave' || chr(1) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k
        |  FROM documents),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source ORDER BY k, doc_id) - 1 AS r,
        |        count(*) OVER (PARTITION BY source) AS ns
        |      FROM h)
        |SELECT CAST(row_number() OVER (
        |         ORDER BY CAST(2*r+1 AS DOUBLE) / CAST(2*ns AS DOUBLE), source, r) - 1
        |       AS BIGINT) AS pos,
        |       doc_id, source
        |FROM r ORDER BY pos""".stripMargin,

    // mirrors the salted join's plain-join equivalence: the oracle IS the
    // unsalted join it must be result-identical to
    // mirrors q77: lower median = element (n+1)//2, p90 = element
    // ceil(0.9n) = (9n+9)//10 of the sorted per-group list (1-based both
    // engines); pure order statistics, no interpolation. NULL n_chars is
    // WHERE-dropped on both sides (Spark collect_list skips NULLs,
    // DuckDB list() keeps them — the filter makes the engines agree)
    "q77_grouped_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
        |  (list_sort(list(n_chars)))[CAST((count(*) + 1) // 2 AS BIGINT)] AS median_chars,
        |  (list_sort(list(n_chars)))[CAST((9 * count(*) + 9) // 10 AS BIGINT)] AS p90_chars
        |FROM documents WHERE n_chars IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-VALUED surface for the operator library — the seam that lets
  * a pure-SQL session (thriftserver, spark-sql, notebook SQL cells) reach
  * the DataFrame-level operators without any Scala call:
  *
  * {{{
  *   SELECT * FROM graft_sliding_agg('kv_view', 'key', 'value', 10, 4, 'sum')
  *   SELECT * FROM graft_dedup_exact('docs_view')
  *   SELECT * FROM graft_hash_sample('docs_view', 'doc_id', 1, 2)
  *   SELECT * FROM graft_chunk('docs_view', 128, 16)
  *   SELECT * FROM graft_training_order('docs_view')
  *   SELECT * FROM graft_interleave_by_source('docs_view')
  *   SELECT * FROM graft_take_per_group('docs_view', 'source', 1000)
  *   SELECT * FROM graft_dedup_spans('docs_view', 8)
  *   SELECT * FROM graft_dedup_best('docs_view', 'n_chars')
  *   SELECT * FROM graft_quantile_filter('docs_view', 'n_chars', 7, 10)
  *   SELECT * FROM graft_quantile_filter_by('docs_view', 'n_chars', 'lang', 7, 10)
  *   SELECT * FROM graft_quality_linear('docs_view', 'weights_view', 4096)
  *   SELECT * FROM graft_bm25_topk('docs_view', 'queries_view', 10)
  *   SELECT * FROM graft_dedup_best_near('docs_view', 'n_chars')
  *   SELECT * FROM graft_sessionize('events_view', 1800)
  *   SELECT * FROM graft_funnel('events_view', 'view,click,purchase')
  *   SELECT * FROM graft_scd2('events_view')
  *   SELECT * FROM graft_decayed_score('events_view', 86400)
  *   SELECT * FROM graft_mode('events_view', 'user_id', 'event_type')
  *   SELECT * FROM graft_bloom_semijoin('fact_view', 'l_orderkey', 'keys_view', 'o_orderkey')
  *   SELECT * FROM graft_pagerank('edges_view', 's', 'd', 3)
  *   SELECT * FROM graft_triangles('edges_view', 'a', 'b')
  *   SELECT * FROM graft_hits('edges_view', 's', 'd', 2)
  *   SELECT * FROM graft_ppr('edges_view', 's', 'd', 'seeds_view', 'node', 3)
  *   SELECT * FROM graft_harmonic('edges_view', 's', 'd', 'seeds_view', 'node', 3)
  *   SELECT * FROM graft_ktruss('edges_view', 'a', 'b', 4, 5)
  *   SELECT * FROM graft_robust_outliers('events_view', 'event_type', 'c', 3)
  *   SELECT * FROM graft_zero_floor('deltas_view', 'k', 'ord', 'delta')
  *   SELECT * FROM graft_attribution('events_view', 'purchase', 'click,view', 3600)
  *   SELECT * FROM graft_position_attribution('events_view', 'purchase', 'click,view', 3600)
  *   SELECT * FROM graft_cohort_ltv('events_view', 'purchase')
  *   SELECT * FROM graft_minmax_scale('orders_view', 'o_orderpriority', 'c', 1000000)
  *   SELECT * FROM graft_equidepth('events_view', 'c', 8)
  *   SELECT * FROM graft_weighted_sample('orders_view', 'c', 1000, 'o_orderkey')
  *   SELECT * FROM graft_ab_report('units_view', 'variant', 'cv', 'control')
  *   SELECT * FROM graft_funnel_latency('events_view', 'view,click,purchase')
  *   SELECT * FROM graft_graph_profile('edges_view', 'a', 'b')
  *   SELECT * FROM graft_join_profile('fact_view', 'fk', 'dim_view', 'k')
  *   SELECT * FROM graft_seasonality('events_view', 86400, 7)
  *   SELECT * FROM graft_vec_stats('embeddings_view', 'embedding', 64)
  *   SELECT * FROM graft_period_deltas('events_view', 86400, 7)
  *   SELECT * FROM graft_lag_stats('events_view', 86400, 7)
  *   SELECT * FROM graft_item_sim('li_view', 'bk', 'item', 2, 5)
  *   SELECT * FROM graft_prorate('li_view', 'g', 'id', 'w', 'tot_view', 't')
  *   SELECT * FROM graft_rolling_median('events_view', 86400, 7)
  *   SELECT * FROM graft_holt('events_view', 3, 10, 1, 10)
  *   SELECT * FROM graft_rollup_tree('pc_view', 'c', 'p', 4, 'f_view', 'k', 'v')
  *   SELECT * FROM graft_radius_join('pts_view', 'id', 'x', 'y', 250)
  *   SELECT * FROM graft_nearest_within('pts_view', 'id', 'x', 'y', 250)
  *   SELECT * FROM graft_zipf('docs_view', 2)
  *   SELECT * FROM graft_fifo_match('buys_v', 'sells_v', 'k', 'id', 'q', 'seq', 64)
  *   SELECT * FROM graft_scd2_lookup('dim_v', 'facts_v', 'user_id', 'tus')
  *   SELECT * FROM graft_dense_series('events_view', 86400)
  *   SELECT * FROM graft_velocity('events_view', 600, 3)
  *   SELECT * FROM graft_cumulative_users('events_view', 86400)
  *   SELECT * FROM graft_equidepth_scores('rfm_view', 'recency_d,freq,mon_c', 5)
  *   SELECT * FROM graft_topk_others('li_view', 'g', 'item', 'c', 3)
  *   SELECT * FROM graft_abc('orders_view', 'o_custkey', 'c', 80, 95)
  *   SELECT * FROM graft_histogram2d('events_view', 'hour', 'c', 1, 500)
  *   SELECT * FROM graft_diff_columns('old_view', 'new_view', 'k')
  *   SELECT * FROM graft_quantile_summary('li_view', 'g', 'x', '1/4,1/2,3/4')
  *   SELECT * FROM graft_qsketch('li_view', 'g', 'x', 1, 51, 50, '1/2,9/10')
  *   SELECT * FROM graft_logsketch('li_view', 'g', 'x', 2, '1/2,9/10')
  *   SELECT * FROM graft_qsketch_weighted('li_view', 'g', 'x', 'w', 1, 51, 50, '1/2,9/10')
  *   SELECT * FROM graft_logsketch_weighted('li_view', 'g', 'x', 'w', 2, '1/2,9/10')
  *   SELECT * FROM graft_skyline3d('pts_view', 'x', 'y', 'z')
  *   SELECT * FROM graft_pagerank_warm('edges_view', 's', 'd', 2, 'prior_view')
  *   SELECT * FROM graft_hits_warm('edges_view', 's', 'd', 2, 'prior_view')
  *   SELECT * FROM graft_label_prop_warm('edges_view', 'a', 'b', 2, 'prior_view')
  *   SELECT * FROM graft_distinct_sketch('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_distinct_registers('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_kmv_sketch('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_kmv_registers('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_kmv_setops('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_contamination_est('docs_view', 'bench_view', 4)
  *   SELECT * FROM graft_kmv_setops3('events_view', 'event_type', 'user_id', 2)
  *   SELECT * FROM graft_cms_registers('events_view', 'event_type', 'user_id', 4, 128)
  *   SELECT * FROM graft_cms_estimate('events_view', 'event_type', 'user_id', 'probes_view', 4, 128)
  *   SELECT * FROM graft_cms_join_size('orders_view', 'o_custkey', 'cust_view', 'c_custkey', 4, 128)
  *   SELECT * FROM graft_countsketch_registers('events_view', 'event_type', 'user_id', 5, 128)
  *   SELECT * FROM graft_bloom_registers('events_view', 'event_type', 'user_id', 256, 4)
  *   SELECT * FROM graft_bloom_contains('members_view', 'user_id', 'probes_view', 'user_id', 256, 4)
  *   SELECT * FROM graft_bloom_prefilter('docs_view', 'bench_view', 4, 16384, 3)
  *   SELECT * FROM graft_prefiltered_decontam('docs_view', 'bench_view', 4, 16384, 3)
  *   SELECT * FROM graft_jl_project('emb_view', 'vec_id', 'embedding', 64, 16)
  *   SELECT * FROM graft_jl_topk('queries_view', 'cands_view', 10, 40)
  *   SELECT * FROM graft_acf('daily_view', 'event_type', 'day', 'x', 7)
  *   SELECT * FROM graft_ccf('daily_view', '', 'day', 'x', 'y', 5)
  *   SELECT * FROM graft_ams_join_size('orders_view', 'o_custkey', 'cust_view', 'c_custkey', 5, 128)
  *   SELECT * FROM graft_zvalue('pts_view', 'x,y', 21)
  *   SELECT * FROM graft_dedup_delta('corpus_sigs_view', 'delta_sigs_view', 16, 8, 2, 3, 4)
  *   SELECT * FROM graft_cc_delta('labels_view', 'new_edges_view')
  *   SELECT * FROM graft_kmeans('emb_view', 'vec_id', 'embedding', 8, 3)
  *   SELECT * FROM graft_semdedup('emb_view', 'vec_id', 'embedding', 8, 3, 800000)
  *   SELECT * FROM graft_kmeans_centroids('emb_view', 'vec_id', 'embedding', 8, 3)
  *   SELECT * FROM graft_kmeans_assign('cents_view', 'emb_view', 'vec_id', 'embedding')
  *   SELECT * FROM graft_semdedup_delta('corpus_view', 'delta_view', 'cents_view', 'vec_id', 'embedding', 800000)
  *   SELECT * FROM graft_assortativity('edges_view', 'a', 'b')
  *   SELECT * FROM graft_rolling_anomaly('events_view', 86400, 7, 30)
  *   SELECT * FROM graft_collocations('docs_view', 5)
  *   SELECT * FROM graft_cusum('events_view', 86400)
  *   SELECT * FROM graft_corr_pairs('wide_view', 'qty_c,price_c,disc_c')
  *   SELECT * FROM graft_melt('wide_view', 'id1,id2', 'm1,m2,m3')
  *   SELECT * FROM graft_missing_ranges('orders_view', 'o_orderkey')
  *   SELECT * FROM graft_ref_check('lineitem_view', 'l_orderkey', 'orders_view', 'o_orderkey')
  *   SELECT * FROM graft_ancestors('pc_view', 'c', 'p', 4)
  *   SELECT * FROM graft_fd_check('orders_view', 'o_orderkey:o_custkey')
  *   SELECT * FROM graft_make_changelog('base_view', 'target_view', 'k', 1)
  *   SELECT * FROM graft_rrf_fuse('runs_view', 'q', 'doc', 'rank', 10)
  *   SELECT * FROM graft_ewma('events_view', 3, 10, 32)
  *   SELECT * FROM graft_gini('events_view', 'user_id', 'event_type')
  *   SELECT * FROM graft_link_predict('edges_view', 'a', 'b', 20, 2)
  *   SELECT * FROM graft_resample('events_view', 3600)
  *   SELECT * FROM graft_session_intervals('events_view', 1800)
  *   SELECT * FROM graft_interval_overlap('sess_view', 's_start', 's_end', 'win_view', 'w_start', 'w_end', 3600)
  *   SELECT * FROM graft_histogram('prices_view', 'price_c', 500000)
  *   SELECT * FROM graft_profile('orders_view', 'o_orderkey,o_custkey')
  *   SELECT * FROM graft_linreg('xy_view', 'event_type', 'x', 'y')
  *   SELECT * FROM graft_cdc_merge('base_view', 'changes_view', 'k')
  *   SELECT * FROM graft_type_ngrams('events_view', 3)
  *   SELECT * FROM graft_mad('view', 'event_type', 'c')
  *   SELECT * FROM graft_kcore('edges_view', 'a', 'b', 3, 10)
  *   SELECT * FROM graft_bfs('edges_view', 'a', 'b', 'seeds_view', 'n', 4)
  * }}}
  *
  * Each TVF resolves its first argument as a table/view name in the
  * session catalog, applies the operator, and splices the operator's
  * logical plan into the outer query — Catalyst then optimizes the whole
  * statement as one plan. Arguments must be literals (they configure the
  * plan, they are not per-row values).
  *
  * Note on `graft_sliding_agg`: the scalable operator computes its range
  * splitters and partition offsets EAGERLY (the reference's sample +
  * count protocol), so planning a statement that uses it runs those small
  * jobs — the same behavior as the Scala API, surfaced at SQL analysis
  * time.
  */
object GraftTableFunctions {

  /** The (name, builder) table the extension injects. */
  private[graft] val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_sliding_agg" -> { exprs =>
      val a = args("graft_sliding_agg", exprs, 6)
      plan(operators.SlidingAggregate.scalable(
        table(a(0)), keyCol = str(a(1)), valueCol = str(a(2)),
        window = int(a(3)), numParts = int(a(4)),
        monoid = operators.LongMonoid.byName(str(a(5)))))
    },
    "graft_dedup_exact" -> { exprs =>
      val a = args("graft_dedup_exact", exprs, 1)
      plan(text.Dedup.exact(table(a(0))))
    },
    "graft_hash_sample" -> { exprs =>
      val a = args("graft_hash_sample", exprs, 4)
      plan(operators.Sampling.byKeyHash(
        table(a(0)), keyCols = Seq(str(a(1))), num = int(a(2)), den = int(a(3))))
    },
    "graft_chunk" -> { exprs =>
      val a = args("graft_chunk", exprs, 3)
      plan(text.Pipeline.chunk(table(a(0)),
        chunkTokens = int(a(1)), overlap = int(a(2))))
    },
    "graft_training_order" -> { exprs =>
      val a = args("graft_training_order", exprs, 1)
      plan(text.Pipeline.trainingOrder(table(a(0))))
    },
    "graft_interleave_by_source" -> { exprs =>
      val a = args("graft_interleave_by_source", exprs, 1)
      plan(text.Pipeline.interleaveBySource(table(a(0))))
    },
    "graft_take_per_group" -> { exprs =>
      val a = args("graft_take_per_group", exprs, 3)
      plan(operators.Sampling.takePerGroup(table(a(0)),
        groupCol = str(a(1)), k = int(a(2))))
    },
    "graft_dedup_spans" -> { exprs =>
      val a = args("graft_dedup_spans", exprs, 2)
      plan(text.Dedup.removeDuplicatedSpans(table(a(0)), n = int(a(1))))
    },
    "graft_dedup_best" -> { exprs =>
      val a = args("graft_dedup_best", exprs, 2)
      plan(text.Dedup.exactBest(table(a(0)), scoreCol = str(a(1))))
    },
    // threshold computed EAGERLY at planning (the exact order-statistic
    // job) — the graft_sliding_agg note applies
    "graft_quantile_filter" -> { exprs =>
      val a = args("graft_quantile_filter", exprs, 4)
      plan(text.Pipeline.filterByQuantile(table(a(0)),
        scoreCol = str(a(1)), num = int(a(2)), den = int(a(3))))
    },
    "graft_quantile_filter_by" -> { exprs =>
      val a = args("graft_quantile_filter_by", exprs, 5)
      plan(text.Pipeline.filterByQuantilePerGroup(table(a(0)),
        scoreCol = str(a(1)), groupCol = str(a(2)),
        num = int(a(3)), den = int(a(4))))
    },
    // the model is a TABLE argument — a trained linear classifier
    // exported as (bucket, w_permille), exactly what a pure-SQL session
    // can CREATE VIEW over
    "graft_quality_linear" -> { exprs =>
      val a = args("graft_quality_linear", exprs, 3)
      plan(text.TextAnalysis.scoreHashedLinear(table(a(0)),
        weights = table(a(1)), dim = int(a(2))))
    },
    // |Q| query ids collect at planning (the graft_sliding_agg note:
    // driver-bounded eager work, same as the Scala API)
    "graft_bm25_topk" -> { exprs =>
      val a = args("graft_bm25_topk", exprs, 3)
      plan(text.Retrieval.bm25TopK(table(a(0)),
        queries = table(a(1)), k = int(a(2))))
    },
    // near-dedup's LSH/CC rounds run EAGERLY at planning (checkpointed
    // iterative lineage cannot be a lazy splice) — the result plan the
    // outer query sees is the survivor table
    "graft_dedup_best_near" -> { exprs =>
      val a = args("graft_dedup_best_near", exprs, 2)
      plan(text.Dedup.nearDedupBest(table(a(0)), scoreCol = str(a(1))))
    },
    // ── event analytics over an `events`-shaped view ──────────────────
    "graft_sessionize" -> { exprs =>
      val a = args("graft_sessionize", exprs, 2)
      plan(events.EventOps.sessionize(table(a(0)), gapSec = int(a(1)).toLong))
    },
    // stages as a comma-separated event-type list, e.g. 'view,click,purchase'
    "graft_funnel" -> { exprs =>
      val a = args("graft_funnel", exprs, 2)
      plan(events.EventOps.funnel(table(a(0)),
        str(a(1)).split(',').map(_.trim).toIndexedSeq))
    },
    "graft_scd2" -> { exprs =>
      val a = args("graft_scd2", exprs, 1)
      plan(events.EventOps.scd2(table(a(0))))
    },
    // the reference-instant max(ts) scalar job runs EAGERLY at planning
    // (the graft_sliding_agg note: driver-bounded eager work)
    "graft_decayed_score" -> { exprs =>
      val a = args("graft_decayed_score", exprs, 2)
      plan(events.EventOps.decayedScore(table(a(0)),
        halfLifeUs = int(a(1)).toLong * 1000000L))
    },
    "graft_mode" -> { exprs =>
      val a = args("graft_mode", exprs, 3)
      plan(operators.TableOps.modePerGroup(table(a(0)),
        key = str(a(1)), value = str(a(2))))
    },
    // the bloom sketch aggregation runs EAGERLY at planning (bounded:
    // O(numBits/8) bytes of model state, never O(keys))
    "graft_bloom_semijoin" -> { exprs =>
      val a = args("graft_bloom_semijoin", exprs, 4)
      plan(operators.BloomJoin.semiJoin(table(a(0)), factKey = str(a(1)),
        keys = table(a(2)), keysKey = str(a(3))))
    },
    // ── graph analytics over an edge-list view ────────────────────────
    // iterative checkpointed lineage runs EAGERLY at planning (the
    // graft_dedup_best_near note); the outer query sees the rank table
    "graft_pagerank" -> { exprs =>
      val a = args("graft_pagerank", exprs, 4)
      plan(graph.PageRank.pageRank(table(a(0)), srcCol = str(a(1)),
        dstCol = str(a(2)), iterations = int(a(3))))
    },
    "graft_triangles" -> { exprs =>
      val a = args("graft_triangles", exprs, 3)
      plan(graph.Triangles.triangles(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2))))
    },
    "graft_ewma" -> { exprs =>
      val a = args("graft_ewma", exprs, 4)
      plan(events.EventOps.ewma(table(a(0)), alphaNum = int(a(1)).toLong,
        alphaDen = int(a(2)).toLong, lastN = int(a(3))))
    },
    "graft_rrf_fuse" -> { exprs =>
      val a = args("graft_rrf_fuse", exprs, 5)
      plan(text.Retrieval.rrfFuse(table(a(0)), queryCol = str(a(1)),
        docCol = str(a(2)), rankCol = str(a(3)), k = int(a(4))))
    },
    "graft_gini" -> { exprs =>
      val a = args("graft_gini", exprs, 3)
      plan(operators.TableOps.giniImpurity(table(a(0)),
        group = str(a(1)), label = str(a(2))))
    },
    "graft_zero_floor" -> { exprs =>
      val a = args("graft_zero_floor", exprs, 4)
      plan(operators.TableOps.zeroFloorBalance(table(a(0)),
        key = str(a(1)), ord = str(a(2)), delta = str(a(3))))
    },
    // window in SECONDS (a literal-int surface; converted to micros)
    "graft_attribution" -> { exprs =>
      val a = args("graft_attribution", exprs, 4)
      plan(events.EventOps.linearAttribution(table(a(0)),
        convType = str(a(1)),
        touchTypes = str(a(2)).split(",").toSeq.map(_.trim).filter(_.nonEmpty),
        windowUs = int(a(3)).toLong * 1000000L))
    },
    "graft_cohort_ltv" -> { exprs =>
      val a = args("graft_cohort_ltv", exprs, 2)
      plan(events.EventOps.cohortLtv(table(a(0)), revenueType = str(a(1))))
    },
    "graft_position_attribution" -> { exprs =>
      val a = args("graft_position_attribution", exprs, 4)
      plan(events.EventOps.positionAttribution(table(a(0)),
        convType = str(a(1)),
        touchTypes = str(a(2)).split(",").toSeq.map(_.trim).filter(_.nonEmpty),
        windowUs = int(a(3)).toLong * 1000000L))
    },
    "graft_robust_outliers" -> { exprs =>
      val a = args("graft_robust_outliers", exprs, 4)
      plan(operators.TableOps.robustOutliers(table(a(0)),
        group = str(a(1)), x = str(a(2)), mult = int(a(3)).toLong))
    },
    // the range splitters compute EAGERLY at planning (graft_sliding_agg note)
    "graft_missing_ranges" -> { exprs =>
      val a = args("graft_missing_ranges", exprs, 2)
      plan(operators.TableOps.missingRanges(table(a(0)), idCol = str(a(1))))
    },
    "graft_ref_check" -> { exprs =>
      val a = args("graft_ref_check", exprs, 4)
      plan(operators.Quality.referential(table(a(0)), childCol = str(a(1)),
        parent = table(a(2)), parentCol = str(a(3))))
    },
    "graft_ancestors" -> { exprs =>
      val a = args("graft_ancestors", exprs, 4)
      plan(graph.Hierarchy.ancestors(table(a(0)), childCol = str(a(1)),
        parentCol = str(a(2)), maxDepth = int(a(3))))
    },
    "graft_ktruss" -> { exprs =>
      val a = args("graft_ktruss", exprs, 5)
      plan(graph.Truss.kTruss(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), k = int(a(3)), maxPeels = int(a(4))))
    },
    // pair list grammar: 'det:dep,det:dep'
    "graft_fd_check" -> { exprs =>
      val a = args("graft_fd_check", exprs, 2)
      val pairs = str(a(1)).split(",").toSeq.map { p =>
        p.split(":") match {
          case Array(x, y) => (x.trim, y.trim)
          case _ => throw new IllegalArgumentException(
            s"graft_fd_check pair '$p' is not det:dep")
        }
      }
      plan(operators.TableOps.functionalDeps(table(a(0)), pairs))
    },
    "graft_harmonic" -> { exprs =>
      val a = args("graft_harmonic", exprs, 6)
      plan(graph.Centrality.harmonicCentrality(table(a(0)),
        aCol = str(a(1)), bCol = str(a(2)), seeds = table(a(3)),
        seedCol = str(a(4)), maxHops = int(a(5))))
    },
    "graft_make_changelog" -> { exprs =>
      val a = args("graft_make_changelog", exprs, 4)
      plan(operators.TableOps.makeChangelog(table(a(0)), table(a(1)),
        key = str(a(2)), seq = int(a(3)).toLong))
    },
    "graft_ppr" -> { exprs =>
      val a = args("graft_ppr", exprs, 6)
      plan(graph.PageRank.personalizedPageRank(table(a(0)),
        srcCol = str(a(1)), dstCol = str(a(2)), seeds = table(a(3)),
        seedCol = str(a(4)), iterations = int(a(5))))
    },
    "graft_hits" -> { exprs =>
      val a = args("graft_hits", exprs, 4)
      plan(graph.Hits.hits(table(a(0)), srcCol = str(a(1)),
        dstCol = str(a(2)), iterations = int(a(3))))
    },
    "graft_link_predict" -> { exprs =>
      val a = args("graft_link_predict", exprs, 5)
      plan(graph.LinkPredict.commonNeighbors(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), maxDegree = int(a(3)), minCommon = int(a(4)).toLong))
    },
    // the grid-bounds scalar job runs EAGERLY at planning (the
    // graft_decayed_score note: driver-bounded eager work)
    "graft_resample" -> { exprs =>
      val a = args("graft_resample", exprs, 2)
      plan(events.EventOps.resample(table(a(0)),
        bucketUs = int(a(1)).toLong * 1000000L))
    },
    "graft_session_intervals" -> { exprs =>
      val a = args("graft_session_intervals", exprs, 2)
      plan(events.EventOps.sessionIntervals(table(a(0)),
        gapSec = int(a(1)).toLong))
    },
    "graft_interval_overlap" -> { exprs =>
      val a = args("graft_interval_overlap", exprs, 7)
      plan(events.RangeJoin.intervalOverlap(
        table(a(0)), lStartCol = str(a(1)), lEndCol = str(a(2)),
        table(a(3)), rStartCol = str(a(4)), rEndCol = str(a(5)),
        bucketWidth = int(a(6)).toLong))
    },
    "graft_histogram" -> { exprs =>
      val a = args("graft_histogram", exprs, 3)
      plan(operators.TableOps.histogram(table(a(0)), valueCol = str(a(1)),
        binWidth = int(a(2)).toLong))
    },
    // columns as a comma-separated list, e.g. 'o_orderkey,o_custkey'
    "graft_profile" -> { exprs =>
      val a = args("graft_profile", exprs, 2)
      plan(operators.TableOps.profile(table(a(0)),
        str(a(1)).split(',').map(_.trim).toIndexedSeq))
    },
    // the wide-table form: one pruned single-column job per column
    "graft_profile_batched" -> { exprs =>
      val a = args("graft_profile_batched", exprs, 2)
      plan(operators.TableOps.profileBatched(table(a(0)),
        str(a(1)).split(',').map(_.trim).toIndexedSeq))
    },
    "graft_linreg" -> { exprs =>
      val a = args("graft_linreg", exprs, 4)
      plan(operators.TableOps.linregStats(table(a(0)), group = str(a(1)),
        x = str(a(2)), y = str(a(3))))
    },
    "graft_cdc_merge" -> { exprs =>
      val a = args("graft_cdc_merge", exprs, 3)
      plan(operators.TableOps.applyChangelog(table(a(0)), table(a(1)),
        key = str(a(2))))
    },
    // N ordered changelog batches as a comma-separated view list; the
    // merges run EAGERLY at planning (checkpointed loop — the
    // graft_pagerank note)
    "graft_cdc_compact" -> { exprs =>
      val a = args("graft_cdc_compact", exprs, 3)
      plan(operators.TableOps.applyChangelogs(table(a(0)),
        str(a(1)).split(',').map(_.trim).toIndexedSeq.map(table),
        key = str(a(2))))
    },
    "graft_type_ngrams" -> { exprs =>
      val a = args("graft_type_ngrams", exprs, 2)
      plan(events.EventOps.typeNgrams(table(a(0)), n = int(a(1))))
    },
    "graft_streaks" -> { exprs =>
      val a = args("graft_streaks", exprs, 1)
      plan(events.EventOps.activityStreaks(table(a(0))))
    },
    // the prefix-sum pass runs EAGERLY at planning (the graft_pagerank note)
    "graft_sliding_distinct" -> { exprs =>
      val a = args("graft_sliding_distinct", exprs, 2)
      plan(events.EventOps.slidingDistinctUsers(table(a(0)),
        windowDays = int(a(1))))
    },
    "graft_frequent_pairs" -> { exprs =>
      val a = args("graft_frequent_pairs", exprs, 4)
      plan(operators.Association.frequentPairs(table(a(0)),
        basketCol = str(a(1)), itemCol = str(a(2)),
        minSupport = int(a(3)).toLong))
    },
    "graft_winsorize" -> { exprs =>
      val a = args("graft_winsorize", exprs, 6)
      plan(operators.TableOps.winsorize(table(a(0)), group = str(a(1)),
        x = str(a(2)), loNum = int(a(3)), hiNum = int(a(4)), den = int(a(5))))
    },
    // rule grammar: ';'-separated not_null:col | unique:col |
    // accepted:col=v1|v2|... | range:col=lo..hi
    "graft_expectations" -> { exprs =>
      val a = args("graft_expectations", exprs, 2)
      val rules = str(a(1)).split(';').map(_.trim).filter(_.nonEmpty).map { r =>
        r.split(":", 2) match {
          case Array("not_null", c) => operators.Quality.ExpectNotNull(c)
          case Array("unique", c) => operators.Quality.ExpectUnique(c)
          case Array("accepted", spec) => spec.split("=", 2) match {
            case Array(c, vs) =>
              operators.Quality.ExpectAccepted(c, vs.split('|').toSeq)
            case _ => sys.error(s"accepted needs col=v1|v2..., got '$r'")
          }
          case Array("range", spec) => spec.split("=", 2) match {
            case Array(c, b) => b.split("\\.\\.", 2) match {
              case Array(lo, hi) =>
                operators.Quality.ExpectRange(c, lo.trim.toLong, hi.trim.toLong)
              case _ => sys.error(s"range needs col=lo..hi, got '$r'")
            }
            case _ => sys.error(s"range needs col=lo..hi, got '$r'")
          }
          case _ => sys.error(s"unknown expectation rule '$r'")
        }
      }.toSeq
      plan(operators.Quality.expectations(table(a(0)), rules))
    },
    // the prefix-max pass runs EAGERLY at planning (the graft_pagerank note)
    "graft_skyline" -> { exprs =>
      val a = args("graft_skyline", exprs, 3)
      plan(operators.Skyline.pareto2d(table(a(0)), x = str(a(1)),
        y = str(a(2))))
    },
    // the iterations run EAGERLY at planning (the graft_pagerank note)
    "graft_pagerank_warm" -> { exprs =>
      val a = args("graft_pagerank_warm", exprs, 5)
      plan(graph.PageRank.pageRank(table(a(0)), srcCol = str(a(1)),
        dstCol = str(a(2)), iterations = int(a(3)),
        prior = Some(table(a(4)))))
    },
    // the iterations run EAGERLY at planning (the graft_pagerank note)
    "graft_hits_warm" -> { exprs =>
      val a = args("graft_hits_warm", exprs, 5)
      plan(graph.Hits.hits(table(a(0)), srcCol = str(a(1)),
        dstCol = str(a(2)), iterations = int(a(3)),
        prior = Some(table(a(4)))))
    },
    // the frontier passes run EAGERLY at planning (the graft_pagerank note)
    "graft_skyline3d" -> { exprs =>
      val a = args("graft_skyline3d", exprs, 4)
      plan(operators.Skyline.pareto3d(table(a(0)), x = str(a(1)),
        y = str(a(2)), z = str(a(3))))
    },
    "graft_qsketch" -> { exprs =>
      val a = args("graft_qsketch", exprs, 7)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val qs = parseQuantiles("graft_qsketch", str(a(6)))
      plan(operators.QuantileSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), lo = long(a(3)), hi = long(a(4)),
        bins = int(a(5)), qs = qs))
    },
    "graft_dedup_delta" -> { exprs =>
      val a = args("graft_dedup_delta", exprs, 7)
      plan(text.Dedup.dedupDelta(table(a(0)), table(a(1)),
        numHashes = int(a(2)), bands = int(a(3)), rowsPerBand = int(a(4)),
        num = int(a(5)), den = int(a(6))))
    },
    // the quotient CC rounds run EAGERLY at planning (the graft_pagerank note)
    "graft_cc_delta" -> { exprs =>
      val a = args("graft_cc_delta", exprs, 2)
      plan(text.Dedup.ccDelta(table(a(0)), table(a(1))))
    },
    // the Lloyd rounds run EAGERLY at planning (the graft_pagerank note)
    "graft_kmeans" -> { exprs =>
      val a = args("graft_kmeans", exprs, 5)
      plan(embed.Clustering.kmeans(table(a(0)), idCol = str(a(1)),
        vecCol = str(a(2)), k = int(a(3)), rounds = int(a(4))))
    },
    "graft_semdedup" -> { exprs =>
      val a = args("graft_semdedup", exprs, 6)
      plan(embed.Clustering.semDedup(table(a(0)), idCol = str(a(1)),
        vecCol = str(a(2)), k = int(a(3)), rounds = int(a(4)),
        minScore1e6 = long(a(5))))
    },
    "graft_kmeans_centroids" -> { exprs =>
      val a = args("graft_kmeans_centroids", exprs, 5)
      plan(embed.Clustering.kmeansCentroids(table(a(0)), idCol = str(a(1)),
        vecCol = str(a(2)), k = int(a(3)), rounds = int(a(4))))
    },
    "graft_kmeans_assign" -> { exprs =>
      val a = args("graft_kmeans_assign", exprs, 4)
      plan(embed.Clustering.kmeansAssign(table(a(0)), table(a(1)),
        idCol = str(a(2)), vecCol = str(a(3))))
    },
    "graft_semdedup_delta" -> { exprs =>
      val a = args("graft_semdedup_delta", exprs, 6)
      plan(embed.Clustering.semDedupDelta(table(a(0)), table(a(1)),
        table(a(2)), idCol = str(a(3)), vecCol = str(a(4)),
        minScore1e6 = long(a(5))))
    },
    "graft_zvalue" -> { exprs =>
      val a = args("graft_zvalue", exprs, 3)
      val zc = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val df = table(a(0))
      plan(df.withColumn("zval",
        operators.Layout.zValue(
          zc.map(org.apache.spark.sql.functions.col), int(a(2)))))
    },
    "graft_distinct_sketch" -> { exprs =>
      val a = args("graft_distinct_sketch", exprs, 4)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.DistinctSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_distinct_registers" -> { exprs =>
      val a = args("graft_distinct_registers", exprs, 4)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.DistinctSketch.registers(table(a(0)), grps,
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_kmv_sketch" -> { exprs =>
      val a = args("graft_kmv_sketch", exprs, 4)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.KmvSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_kmv_registers" -> { exprs =>
      val a = args("graft_kmv_registers", exprs, 4)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.KmvSketch.registers(table(a(0)), grps,
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_kmv_setops" -> { exprs =>
      val a = args("graft_kmv_setops", exprs, 4)
      plan(operators.KmvSketch.setops(table(a(0)), keyCol = str(a(1)),
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_kmv_setops3" -> { exprs =>
      val a = args("graft_kmv_setops3", exprs, 4)
      plan(operators.KmvSketch.setops3(table(a(0)), keyCol = str(a(1)),
        valueCol = str(a(2)), hexChars = int(a(3))))
    },
    "graft_contamination_est" -> { exprs =>
      val a = args("graft_contamination_est", exprs, 3)
      plan(text.Pipeline.contaminationEstimate(table(a(0)), table(a(1)),
        n = int(a(2))))
    },
    "graft_cms_registers" -> { exprs =>
      val a = args("graft_cms_registers", exprs, 5)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.CountMinSketch.registers(table(a(0)), grps,
        valueCol = str(a(2)), depth = int(a(3)), width = int(a(4))))
    },
    "graft_acf" -> { exprs =>
      val a = args("graft_acf", exprs, 5)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.Autocorr.acf(table(a(0)), grps, tCol = str(a(2)),
        xCol = str(a(3)), maxLag = int(a(4))))
    },
    "graft_ccf" -> { exprs =>
      val a = args("graft_ccf", exprs, 6)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.Autocorr.ccf(table(a(0)), grps, tCol = str(a(2)),
        xCol = str(a(3)), yCol = str(a(4)), maxLag = int(a(5))))
    },
    "graft_countsketch_registers" -> { exprs =>
      val a = args("graft_countsketch_registers", exprs, 5)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.CountSketch.registers(table(a(0)), grps,
        valueCol = str(a(2)), depth = int(a(3)), width = int(a(4))))
    },
    "graft_ams_join_size" -> { exprs =>
      val a = args("graft_ams_join_size", exprs, 6)
      val d = int(a(4)); val w = int(a(5))
      val skA = operators.CountSketch.sketch(table(a(0)), Nil, str(a(1)),
        d, w, out = "__a")
      val skB = operators.CountSketch.sketch(table(a(2)), Nil, str(a(3)),
        d, w, out = "__b")
      // 1-row × 1-row: the two global sketches meet in a trivial cross
      plan(skA.crossJoin(skB).select(operators.CountSketch
        .estimateJoinSize(org.apache.spark.sql.functions.col("__a"),
          org.apache.spark.sql.functions.col("__b"), d, w)
        .as("join_size_est")))
    },
    "graft_cms_join_size" -> { exprs =>
      val a = args("graft_cms_join_size", exprs, 6)
      val d = int(a(4)); val w = int(a(5))
      val skA = operators.CountMinSketch.sketch(table(a(0)), Nil, str(a(1)),
        d, w, out = "__a")
      val skB = operators.CountMinSketch.sketch(table(a(2)), Nil, str(a(3)),
        d, w, out = "__b")
      // 1-row × 1-row: the two global sketches meet in a trivial cross
      plan(skA.crossJoin(skB).select(operators.CountMinSketch
        .estimateJoinSize(org.apache.spark.sql.functions.col("__a"),
          org.apache.spark.sql.functions.col("__b"), d, w)
        .as("join_size_est")))
    },
    "graft_cms_join_strategy" -> { exprs =>
      val a = args("graft_cms_join_strategy", exprs, 7)
      val left = table(a(0)); val lkey = str(a(1))
      // one key name per side; the right side aligns to the left's name
      val right = table(a(2)).select(org.apache.spark.sql.functions
        .col(str(a(3))).as(lkey))
      val (s, ra, rb) = operators.Salted.plan(left, right, lkey,
        broadcastRows = long(a(4)), skewShare1e6 = long(a(5)),
        skewMinRows = long(a(6)))
      val sp = left.sparkSession
      import sp.implicits._
      plan(Seq((s, ra, rb)).toDF("strategy", "left_rows", "right_rows"))
    },
    "graft_ivf_assign_delta" -> { exprs =>
      val a = args("graft_ivf_assign_delta", exprs, 3)
      plan(embed.Similarity.ivfAssignDelta(table(a(0)), table(a(1)),
        table(a(2))))
    },
    "graft_pq_encode_delta" -> { exprs =>
      val a = args("graft_pq_encode_delta", exprs, 3)
      plan(embed.Pq.encodeDelta(table(a(0)), table(a(1)), table(a(2))))
    },
    "graft_prefiltered_decontam" -> { exprs =>
      val a = args("graft_prefiltered_decontam", exprs, 5)
      plan(text.Pipeline.decontaminateNgramsPrefiltered(table(a(0)),
        table(a(1)), n = int(a(2)), numWords = int(a(3)), k = int(a(4))))
    },
    "graft_jl_project" -> { exprs =>
      val a = args("graft_jl_project", exprs, 5)
      plan(embed.Jl.projectRows(table(a(0)), idCol = str(a(1)),
        embCol = str(a(2)), inDims = int(a(3)), outDims = int(a(4))))
    },
    "graft_jl_topk" -> { exprs =>
      val a = args("graft_jl_topk", exprs, 4)
      plan(embed.Jl.jlTopK(table(a(0)), table(a(1)), k = int(a(2)),
        shortK = int(a(3))))
    },
    "graft_bloom_registers" -> { exprs =>
      val a = args("graft_bloom_registers", exprs, 5)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.BloomSketch.registers(table(a(0)), grps,
        valueCol = str(a(2)), numWords = int(a(3)), k = int(a(4))))
    },
    "graft_bloom_contains" -> { exprs =>
      val a = args("graft_bloom_contains", exprs, 6)
      val state = operators.BloomSketch.sketchSparse(table(a(0)), Nil,
        valueCol = str(a(1)), numWords = int(a(4)), k = int(a(5)))
      plan(operators.BloomSketch.containsSparse(state, table(a(2)),
        idCols = Nil, valueCol = str(a(3)), numWords = int(a(4)),
        k = int(a(5))))
    },
    "graft_bloom_prefilter" -> { exprs =>
      val a = args("graft_bloom_prefilter", exprs, 5)
      plan(text.Pipeline.decontamPrefilter(table(a(0)), table(a(1)),
        n = int(a(2)), numWords = int(a(3)), k = int(a(4))))
    },
    "graft_cms_estimate" -> { exprs =>
      val a = args("graft_cms_estimate", exprs, 6)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val d = int(a(4)); val w = int(a(5))
      val sk = operators.CountMinSketch.sketch(table(a(0)), grps,
        valueCol = str(a(2)), depth = d, width = w)
      plan(operators.CountMinSketch.estimates(sk, "sketch",
        table(a(3)), depth = d, width = w))
    },
    "graft_qsketch_weighted" -> { exprs =>
      val a = args("graft_qsketch_weighted", exprs, 8)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.QuantileSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), lo = long(a(4)), hi = long(a(5)),
        bins = int(a(6)),
        qs = parseQuantiles("graft_qsketch_weighted", str(a(7))),
        weightCol = Some(str(a(3)))))
    },
    "graft_logsketch" -> { exprs =>
      val a = args("graft_logsketch", exprs, 5)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.LogQuantileSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), digits = int(a(3)),
        qs = parseQuantiles("graft_logsketch", str(a(4)))))
    },
    "graft_logsketch_weighted" -> { exprs =>
      val a = args("graft_logsketch_weighted", exprs, 6)
      val grps = str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.LogQuantileSketch.summary(table(a(0)), grps,
        valueCol = str(a(2)), digits = int(a(4)),
        qs = parseQuantiles("graft_logsketch_weighted", str(a(5))),
        weightCol = Some(str(a(3)))))
    },
    "graft_agg_state" -> { exprs =>
      val a = args("graft_agg_state", exprs, 3)
      plan(operators.TableOps.aggState(table(a(0)), key = str(a(1)),
        x = str(a(2))))
    },
    "graft_merge_agg_states" -> { exprs =>
      val a = args("graft_merge_agg_states", exprs, 3)
      plan(operators.TableOps.mergeAggStates(table(a(0)), table(a(1)),
        key = str(a(2))))
    },
    "graft_twap" -> { exprs =>
      val a = args("graft_twap", exprs, 1)
      plan(events.EventOps.timeWeightedAvg(table(a(0))))
    },
    "graft_mad" -> { exprs =>
      val a = args("graft_mad", exprs, 3)
      plan(operators.TableOps.madPerGroup(table(a(0)), group = str(a(1)),
        x = str(a(2))))
    },
    // the peel rounds run EAGERLY at planning (checkpointed iterative
    // lineage — the graft_pagerank note)
    "graft_kcore" -> { exprs =>
      val a = args("graft_kcore", exprs, 5)
      plan(graph.KCore.kCore(table(a(0)), aCol = str(a(1)), bCol = str(a(2)),
        k = int(a(3)), maxPeels = int(a(4))))
    },
    "graft_clustering_coeff" -> { exprs =>
      val a = args("graft_clustering_coeff", exprs, 3)
      plan(graph.Triangles.clusteringCoefficient(table(a(0)),
        aCol = str(a(1)), bCol = str(a(2))))
    },
    "graft_percent_ranks" -> { exprs =>
      val a = args("graft_percent_ranks", exprs, 3)
      plan(operators.TableOps.percentRanks(table(a(0)), group = str(a(1)),
        x = str(a(2))))
    },
    "graft_minmax_scale" -> { exprs =>
      val a = args("graft_minmax_scale", exprs, 4)
      plan(operators.TableOps.minmaxScale(table(a(0)), group = str(a(1)),
        x = str(a(2)), scale = long(a(3))))
    },
    "graft_equidepth" -> { exprs =>
      val a = args("graft_equidepth", exprs, 3)
      plan(operators.TableOps.equiDepthBuckets(table(a(0)), x = str(a(1)),
        nBuckets = int(a(2))))
    },
    "graft_period_deltas" -> { exprs =>
      val a = args("graft_period_deltas", exprs, 3)
      plan(events.EventOps.periodDeltas(table(a(0)),
        bucketUs = long(a(1)) * 1000000L, periodBuckets = int(a(2))))
    },
    "graft_equidepth_scores" -> { exprs =>
      val a = args("graft_equidepth_scores", exprs, 3)
      plan(operators.TableOps.equiDepthScores(table(a(0)),
        str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
        nBuckets = int(a(2))))
    },
    "graft_item_sim" -> { exprs =>
      val a = args("graft_item_sim", exprs, 5)
      plan(operators.Association.itemSimilarity(table(a(0)),
        basketCol = str(a(1)), itemCol = str(a(2)),
        minSupport = long(a(3)), k = int(a(4))))
    },
    "graft_rollup_tree" -> { exprs =>
      val a = args("graft_rollup_tree", exprs, 7)
      plan(graph.Hierarchy.rollupSum(table(a(0)), childCol = str(a(1)),
        parentCol = str(a(2)), maxDepth = int(a(3)), facts = table(a(4)),
        keyCol = str(a(5)), valueCol = str(a(6))))
    },
    "graft_scd2_lookup" -> { exprs =>
      val a = args("graft_scd2_lookup", exprs, 4)
      plan(events.EventOps.scd2Lookup(table(a(0)), table(a(1)),
        keyCol = str(a(2)), timeCol = str(a(3))))
    },
    "graft_dense_series" -> { exprs =>
      val a = args("graft_dense_series", exprs, 2)
      plan(events.EventOps.denseSeries(table(a(0)),
        bucketUs = long(a(1)) * 1000000L))
    },
    "graft_cumulative_users" -> { exprs =>
      val a = args("graft_cumulative_users", exprs, 2)
      plan(events.EventOps.cumulativeUsers(table(a(0)),
        bucketUs = long(a(1)) * 1000000L))
    },
    "graft_velocity" -> { exprs =>
      val a = args("graft_velocity", exprs, 3)
      plan(events.EventOps.velocity(table(a(0)),
        windowUs = long(a(1)) * 1000000L, minBurst = long(a(2))))
    },
    "graft_fifo_match" -> { exprs =>
      val a = args("graft_fifo_match", exprs, 7)
      plan(operators.Inventory.fifoMatch(table(a(0)), table(a(1)),
        key = str(a(2)), id = str(a(3)), qtyCol = str(a(4)),
        seqCol = str(a(5)), qtyBucket = long(a(6))))
    },
    "graft_prorate" -> { exprs =>
      val a = args("graft_prorate", exprs, 6)
      plan(operators.TableOps.prorate(table(a(0)), group = str(a(1)),
        id = str(a(2)), weightCol = str(a(3)), totals = table(a(4)),
        totalCol = str(a(5))))
    },
    "graft_rolling_median" -> { exprs =>
      val a = args("graft_rolling_median", exprs, 3)
      plan(events.EventOps.rollingMedian(table(a(0)),
        bucketUs = long(a(1)) * 1000000L, window = int(a(2))))
    },
    "graft_holt" -> { exprs =>
      val a = args("graft_holt", exprs, 5)
      plan(events.EventOps.holtSmooth(table(a(0)), alphaNum = long(a(1)),
        alphaDen = long(a(2)), betaNum = long(a(3)), betaDen = long(a(4))))
    },
    "graft_lag_stats" -> { exprs =>
      val a = args("graft_lag_stats", exprs, 3)
      plan(events.EventOps.lagStats(table(a(0)),
        bucketUs = long(a(1)) * 1000000L, maxLag = int(a(2))))
    },
    "graft_radius_join" -> { exprs =>
      val a = args("graft_radius_join", exprs, 5)
      plan(operators.Spatial.radiusJoin(table(a(0)), idCol = str(a(1)),
        xCol = str(a(2)), yCol = str(a(3)), radius = long(a(4))))
    },
    "graft_nearest_within" -> { exprs =>
      val a = args("graft_nearest_within", exprs, 5)
      plan(operators.Spatial.nearestNeighbor(table(a(0)), idCol = str(a(1)),
        xCol = str(a(2)), yCol = str(a(3)), radius = long(a(4))))
    },
    "graft_zipf" -> { exprs =>
      val a = args("graft_zipf", exprs, 2)
      plan(text.Ngrams.zipfProfile(table(a(0)), minCount = long(a(1))))
    },
    "graft_vec_stats" -> { exprs =>
      val a = args("graft_vec_stats", exprs, 3)
      plan(embed.VecStats.perDimStats(table(a(0)), vecCol = str(a(1)),
        dim = int(a(2))))
    },
    "graft_topk_others" -> { exprs =>
      val a = args("graft_topk_others", exprs, 5)
      plan(operators.TableOps.topKWithOthers(table(a(0)),
        group = str(a(1)), item = str(a(2)), x = str(a(3)),
        k = int(a(4))))
    },
    "graft_seasonality" -> { exprs =>
      val a = args("graft_seasonality", exprs, 3)
      plan(events.EventOps.seasonalProfile(table(a(0)),
        bucketUs = long(a(1)) * 1000000L, periodBuckets = int(a(2))))
    },
    "graft_abc" -> { exprs =>
      val a = args("graft_abc", exprs, 5)
      plan(operators.TableOps.abcAnalysis(table(a(0)), group = str(a(1)),
        x = str(a(2)), aPct = int(a(3)), bPct = int(a(4))))
    },
    "graft_join_profile" -> { exprs =>
      val a = args("graft_join_profile", exprs, 4)
      plan(operators.TableOps.joinProfile(table(a(0)), keyA = str(a(1)),
        table(a(2)), keyB = str(a(3))))
    },
    "graft_histogram2d" -> { exprs =>
      val a = args("graft_histogram2d", exprs, 5)
      plan(operators.TableOps.histogram2d(table(a(0)), xCol = str(a(1)),
        yCol = str(a(2)), binX = long(a(3)), binY = long(a(4))))
    },
    "graft_graph_profile" -> { exprs =>
      val a = args("graft_graph_profile", exprs, 3)
      plan(graph.GraphProfile.profile(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2))))
    },
    "graft_funnel_latency" -> { exprs =>
      val a = args("graft_funnel_latency", exprs, 2)
      plan(events.EventOps.funnelLatency(table(a(0)),
        str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq))
    },
    "graft_diff_columns" -> { exprs =>
      val a = args("graft_diff_columns", exprs, 3)
      plan(operators.TableOps.snapshotDiffColumns(table(a(0)), table(a(1)),
        key = str(a(2))))
    },
    "graft_ab_report" -> { exprs =>
      val a = args("graft_ab_report", exprs, 4)
      plan(operators.Experiment.abReport(table(a(0)),
        variantCol = str(a(1)), convertedCol = str(a(2)),
        control = str(a(3))))
    },
    // quantiles as 'num/den' pairs: '1/4,1/2,3/4'
    "graft_quantile_summary" -> { exprs =>
      val a = args("graft_quantile_summary", exprs, 4)
      val qs = parseQuantiles("graft_quantile_summary", str(a(3)))
      plan(operators.TableOps.quantileSummary(table(a(0)),
        group = str(a(1)), x = str(a(2)), qs))
    },
    "graft_weighted_sample" -> { exprs =>
      val a = args("graft_weighted_sample", exprs, 4)
      plan(operators.Sampling.systematicWeighted(table(a(0)),
        weightCol = str(a(1)), k = int(a(2)),
        org.apache.spark.sql.functions.col(str(a(3)))))
    },
    "graft_assortativity" -> { exprs =>
      val a = args("graft_assortativity", exprs, 3)
      plan(graph.Assortativity.degreeAssortativity(table(a(0)),
        aCol = str(a(1)), bCol = str(a(2))))
    },
    "graft_rolling_anomaly" -> { exprs =>
      val a = args("graft_rolling_anomaly", exprs, 4)
      plan(events.EventOps.rollingAnomaly(table(a(0)),
        bucketUs = long(a(1)) * 1000000L, window = int(a(2)),
        zTimes10 = int(a(3))))
    },
    "graft_collocations" -> { exprs =>
      val a = args("graft_collocations", exprs, 2)
      plan(text.Ngrams.collocations(table(a(0)), minCount = long(a(1))))
    },
    "graft_cusum" -> { exprs =>
      val a = args("graft_cusum", exprs, 2)
      plan(events.EventOps.cusumChangepoint(table(a(0)),
        bucketUs = long(a(1)) * 1000000L))
    },
    "graft_corr_pairs" -> { exprs =>
      val a = args("graft_corr_pairs", exprs, 2)
      plan(operators.TableOps.corrPairs(table(a(0)),
        str(a(1)).split(',').map(_.trim).filter(_.nonEmpty).toSeq))
    },
    "graft_melt" -> { exprs =>
      val a = args("graft_melt", exprs, 3)
      def split(s: String) =
        s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      plan(operators.TableOps.melt(table(a(0)), split(str(a(1))),
        split(str(a(2)))))
    },
    "graft_label_prop" -> { exprs =>
      val a = args("graft_label_prop", exprs, 4)
      plan(graph.LabelProp.labelPropagation(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), rounds = int(a(3))))
    },
    // the rounds run EAGERLY at planning (the graft_pagerank note)
    "graft_label_prop_warm" -> { exprs =>
      val a = args("graft_label_prop_warm", exprs, 5)
      plan(graph.LabelProp.labelPropagation(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), rounds = int(a(3)),
        prior = Some(table(a(4)))))
    },
    "graft_sssp" -> { exprs =>
      val a = args("graft_sssp", exprs, 7)
      plan(graph.Bfs.shortestPaths(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), wCol = Some(str(a(3))), sources = table(a(4)),
        srcNode = str(a(5)), maxRounds = int(a(6))))
    },
    "graft_bfs" -> { exprs =>
      val a = args("graft_bfs", exprs, 6)
      plan(graph.Bfs.hopDistance(table(a(0)), aCol = str(a(1)),
        bCol = str(a(2)), sources = table(a(3)), srcNode = str(a(4)),
        maxHops = int(a(5))))
    })

  private[graft] def descriptions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    all.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getName, name), builder)
    }

  // ── literal-argument plumbing ─────────────────────────────────────────

  private def args(fn: String, exprs: Seq[Expression], n: Int): Seq[Any] = {
    require(exprs.length == n, s"$fn expects $n arguments, got ${exprs.length}")
    exprs.map { e =>
      require(e.foldable, s"$fn arguments must be literals, got: ${e.sql}")
      e.eval()
    }
  }

  /** Parses a 'num/den[,num/den...]' quantile list, failing with the
    * argument-error shape the other TVFs emit (a malformed '0.5' or
    * '1/2/3' previously surfaced as an opaque MatchError). Range checks
    * (1 <= num <= den, den bound) stay in [[operators.QuantileSketch]]. */
  private def parseQuantiles(fn: String, spec: String): Seq[(Int, Int)] = {
    val qs = spec.split(',').map(_.trim).filter(_.nonEmpty).map { q =>
      q.split('/') match {
        case Array(n, d) =>
          try (n.trim.toInt, d.trim.toInt)
          catch { case _: NumberFormatException => sys.error(
            s"$fn: quantile term '$q' is not integer num/den " +
              "(expected 'num/den[,num/den...]', e.g. '1/4,1/2,3/4')") }
        case _ => sys.error(
          s"$fn: quantile term '$q' malformed " +
            "(expected 'num/den[,num/den...]', e.g. '1/4,1/2,3/4')")
      }
    }.toSeq
    require(qs.nonEmpty, s"$fn: empty quantile list " +
      "(expected 'num/den[,num/den...]', e.g. '1/4,1/2,3/4')")
    qs
  }

  private def str(v: Any): String = v match {
    case s: UTF8String => s.toString
    case s: String => s
    case other => sys.error(s"expected a string literal, got $other")
  }

  private def int(v: Any): Int = v match {
    case i: Int => i
    case l: Long => Math.toIntExact(l)
    case other => sys.error(s"expected an integer literal, got $other")
  }

  private def long(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case other => sys.error(s"expected an integer literal, got $other")
  }

  private def table(nameArg: Any) = SparkSession.active.table(str(nameArg))

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.logical
}

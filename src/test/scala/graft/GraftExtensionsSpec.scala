package graft

import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.functions.expr

/** The extensions entry point must make the native functions available to
  * a pure-SQL session with no Scala-API register() call. */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions injects the native functions") {
    // materialize the shared session FIRST (it's lazy) — otherwise the
    // builder below would CREATE the shared session and the test would
    // compare a session against itself
    spark.range(1).count()
    // force a NEW SparkSession (same SparkContext) so the extensions
    // are actually applied — getOrCreate would return the shared one.
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext,
    // so with a reused context the spec goes through withExtensions — the
    // same injection path the conf triggers on a fresh context. The
    // reflective instantiation proves the zero-arg-constructor contract
    // the conf loader requires.
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ClassicSession.clearDefaultSession()
    ClassicSession.clearActiveSession()
    val s2 = ClassicSession.builder()
      .master("local[2]")
      .withExtensions(ext)
      .getOrCreate()
    try {
      assert(s2 ne spark, "builder returned the shared session — extensions never applied")
      val dot = s2.sql("SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L))")
        .collect()(0).getLong(0)
      assert(dot == 32L)
      val ic = s2.sql("SELECT sorted_intersect_count(array(1, 3, 5), array(3, 4, 5))")
        .collect()(0).getLong(0)
      assert(ic == 2L)
      val bpe = s2.sql("SELECT bpe_tokens('they', array('th', 'the'))")
        .collect()(0).getSeq[String](0)
      assert(bpe == Seq("the", "y"))
    } finally {
      val shared = spark.asInstanceOf[ClassicSession]
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }

  test("table-valued functions expose the operator library to pure SQL") {
    spark.range(1).count() // materialize the shared session first
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ClassicSession.clearDefaultSession()
    ClassicSession.clearActiveSession()
    val s2 = ClassicSession.builder()
      .master("local[2]")
      .withExtensions(ext)
      .getOrCreate()
    try {
      import s2.implicits._
      val kv = (1L to 100L).map(i => ((i * 37) % 101, i)).toDF("key", "value")
      kv.createOrReplaceTempView("kv_view")
      val docs = Seq(
        (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "x y z"),
        (4L, "p q r s t u v w"), (5L, "x y z")).toDF("doc_id", "text")
      docs.createOrReplaceTempView("docs_view")

      // each result must match the Scala API applied to the same input
      val sqlSliding = s2.sql(
        "SELECT * FROM graft_sliding_agg('kv_view', 'key', 'value', 10, 4, 'sum')")
        .collect().map(_.toSeq).toSeq
      val apiSliding = graft.operators.SlidingAggregate
        .scalable(kv, "key", "value", window = 10, numParts = 4)
        .collect().map(_.toSeq).toSeq
      assert(sqlSliding == apiSliding)

      val sqlDedup = s2.sql("SELECT * FROM graft_dedup_exact('docs_view')")
        .collect().map(_.toSeq).toSeq
      assert(sqlDedup == graft.text.Dedup.exact(docs).collect().map(_.toSeq).toSeq)
      assert(sqlDedup.map(r => (r(0), r(1))).toSet == Set((1L, 2L), (3L, 2L), (4L, 1L)))

      val sqlSample = s2.sql(
        "SELECT * FROM graft_hash_sample('docs_view', 'doc_id', 1, 2)")
        .collect().map(_.getLong(0)).toSet
      val apiSample = graft.operators.Sampling.byKeyHash(docs, Seq("doc_id"), 1, 2)
        .collect().map(_.getLong(0)).toSet
      assert(sqlSample == apiSample)

      val sqlChunk = s2.sql("SELECT * FROM graft_chunk('docs_view', 4, 1)")
        .collect().map(_.toSeq).toSeq
      val apiChunk = graft.text.Pipeline.chunk(docs, 4, 1)
        .collect().map(_.toSeq).toSeq
      assert(sqlChunk == apiChunk && sqlChunk.nonEmpty)

      val sqlColl = s2.sql("SELECT * FROM graft_collocations('docs_view', 2)")
        .collect().map(_.toSeq).toSeq
      assert(sqlColl == graft.text.Ngrams.collocations(docs, 2L)
        .collect().map(_.toSeq).toSeq && sqlColl.nonEmpty)

      val docsSrc = Seq(
        (1L, "t1", "web"), (2L, "t2", "web"), (3L, "t3", "web"), (4L, "t4", "web"),
        (5L, "t5", "books"), (6L, "t6", "books"), (7L, "t7", "books"), (8L, "t8", "books")
      ).toDF("doc_id", "text", "source")
      docsSrc.createOrReplaceTempView("docs_src_view")
      val sqlOrder = s2.sql("SELECT * FROM graft_training_order('docs_src_view')")
        .collect().map(_.toSeq).toSeq
      assert(sqlOrder == graft.text.Pipeline.trainingOrder(docsSrc)
        .collect().map(_.toSeq).toSeq)
      val sqlInter = s2.sql("SELECT * FROM graft_interleave_by_source('docs_src_view')")
        .orderBy("pos").collect().map(_.toSeq).toSeq
      assert(sqlInter == graft.text.Pipeline.interleaveBySource(docsSrc)
        .orderBy("pos").collect().map(_.toSeq).toSeq)
      val sqlCap = s2.sql("SELECT * FROM graft_take_per_group('docs_src_view', 'source', 2)")
        .collect().map(_.getLong(0)).toSet
      assert(sqlCap == graft.operators.Sampling.takePerGroup(docsSrc, "source", 2)
        .collect().map(_.getLong(0)).toSet)
      assert(sqlCap.size == 4) // 2 per source

      val sqlSpans = s2.sql("SELECT * FROM graft_dedup_spans('docs_view', 4)")
        .collect().map(_.toSeq).toSeq
      assert(sqlSpans == graft.text.Dedup.removeDuplicatedSpans(docs, 4)
        .collect().map(_.toSeq).toSeq)
      // docs 1/2 duplicate: doc 2's spans are removed, doc 1 intact
      val spansById = sqlSpans.map(r => r(0) -> r(3)).toMap
      assert(spansById(1L) == 0L && spansById(2L) == 8L, s"$spansById")

      val docsScored = Seq((1L, "a b c", 5L), (2L, "c b a", 9L),
        (3L, "x y", 2L), (4L, "y x", 7L)).toDF("doc_id", "text", "n_chars")
      docsScored.createOrReplaceTempView("docs_scored_view")
      val sqlBest = s2.sql(
        "SELECT * FROM graft_dedup_best('docs_scored_view', 'n_chars')")
        .collect().map(_.toSeq).toSeq
      assert(sqlBest == graft.text.Dedup.exactBest(docsScored, "n_chars")
        .collect().map(_.toSeq).toSeq)
      // groups {1,2} and {3,4}: the higher-scored member survives
      assert(sqlBest.map(r => (r(0), r(1))).toSet == Set((2L, 9L), (4L, 7L)))
      val sqlQf = s2.sql(
        "SELECT * FROM graft_quantile_filter('docs_scored_view', 'n_chars', 1, 2)")
        .collect().map(_.getLong(0)).toSet
      assert(sqlQf == graft.text.Pipeline
        .filterByQuantile(docsScored, "n_chars", 1, 2)
        .collect().map(_.getLong(0)).toSet)
      assert(sqlQf == Set(2L, 4L)) // median of {2,5,7,9} at rank 2 -> 7
      val scoredSrc = Seq((1L, "web", 1L), (2L, "web", 9L),
        (3L, "books", 4L), (4L, "books", 2L)).toDF("doc_id", "lang", "n_chars")
      scoredSrc.createOrReplaceTempView("docs_grouped_view")
      val sqlQfBy = s2.sql(
        "SELECT * FROM graft_quantile_filter_by('docs_grouped_view', 'n_chars', 'lang', 1, 2)")
        .collect().map(_.getLong(0)).toSet
      assert(sqlQfBy == graft.text.Pipeline
        .filterByQuantilePerGroup(scoredSrc, "n_chars", "lang", 1, 2)
        .collect().map(_.getLong(0)).toSet)
      assert(sqlQfBy == Set(2L, 3L)) // per-group medians: web 9, books 4

      // model-scored quality: the weights table is itself a view
      val weights = s2.range(64).select($"id".as("bucket"),
        org.apache.spark.sql.functions.lit(1L).as("w_permille"))
      weights.createOrReplaceTempView("weights_view")
      val sqlQl = s2.sql(
        "SELECT * FROM graft_quality_linear('docs_view', 'weights_view', 64)")
        .collect().map(_.toSeq).toSeq
      assert(sqlQl == graft.text.TextAnalysis
        .scoreHashedLinear(docs, weights, 64)
        .collect().map(_.toSeq).toSeq)
      // uniform weight-1 model: every doc's logit = its token count
      assert(sqlQl.map(r => (r(0), r(2))).toSet ==
        Set((1L, 8L), (2L, 8L), (3L, 3L), (4L, 8L), (5L, 3L)))

      val queries = Seq(("q1", "a b"), ("q2", "x")).toDF("q_id", "qtext")
      queries.createOrReplaceTempView("queries_view")
      val sqlBm = s2.sql(
        "SELECT * FROM graft_bm25_topk('docs_view', 'queries_view', 3)")
        .collect().map(_.toSeq).toSeq
      assert(sqlBm == graft.text.Retrieval.bm25TopK(docs, queries, k = 3)
        .collect().map(_.toSeq).toSeq)
      assert(sqlBm.nonEmpty)
      // q2's term 'x' hits exactly docs 3 and 5
      assert(sqlBm.collect { case Seq("q2", _, d, _) => d }.toSet == Set(3L, 5L))

      val docsNear = Seq(
        (1L, "alpha beta gamma delta epsilon", 5L),
        (2L, "alpha beta gamma delta epsilon", 9L),
        (3L, "other words entirely here now", 2L)).toDF("doc_id", "text", "n_chars")
      docsNear.createOrReplaceTempView("docs_near_view")
      val sqlNdBest = s2.sql(
        "SELECT * FROM graft_dedup_best_near('docs_near_view', 'n_chars')")
        .collect().map(_.toSeq).toSeq
      assert(sqlNdBest == graft.text.Dedup.nearDedupBest(docsNear, "n_chars")
        .collect().map(_.toSeq).toSeq)
      // cluster {1,2}: the BEST-scored member (doc 2) survives, not the
      // min-id one; singleton doc 3 is its own representative
      assert(sqlNdBest.map(r => (r(1), r(2))).toSet == Set((2L, 9L), (3L, 2L)))

      // TVFs compose inside a larger statement (the plan splices in)
      val n = s2.sql(
        """SELECT count(*) AS c FROM graft_chunk('docs_view', 4, 1)
          |WHERE doc_id <= 2""".stripMargin).collect()(0).getLong(0)
      assert(n == apiChunk.count(_.head.asInstanceOf[Long] <= 2))

      // non-literal / wrong-arity arguments fail with the function's name
      val err = intercept[Exception] {
        s2.sql("SELECT * FROM graft_dedup_exact('docs_view', 1)").collect()
      }
      assert(err.getMessage.contains("graft_dedup_exact"))
    } finally {
      val shared = spark.asInstanceOf[ClassicSession]
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }

  test("event-analytics and bloom TVFs match their Scala APIs") {
    spark.range(1).count() // materialize the shared session first
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ClassicSession.clearDefaultSession()
    ClassicSession.clearActiveSession()
    val s2 = ClassicSession.builder()
      .master("local[2]")
      .withExtensions(ext)
      .getOrCreate()
    try {
      import s2.implicits._
      val ev = Seq(
        (0L, 10L, 1L, "view", 1.0), (1L, 20L, 1L, "click", 2.0),
        (2L, 4000L, 1L, "view", 3.0), (3L, 4100L, 1L, "purchase", 4.0),
        (4L, 50L, 2L, "view", 5.0), (5L, 60L, 2L, "view", 6.0))
        .map { case (id, s, u, ty, v) => (id, s * 1000000000L, u, ty, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      ev.createOrReplaceTempView("events_view")

      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq

      assert(rows(s2.sql("SELECT * FROM graft_sessionize('events_view', 1800)"))
        == rows(graft.events.EventOps.sessionize(ev, 1800)))
      assert(rows(s2.sql(
        "SELECT * FROM graft_funnel('events_view', 'view,click,purchase')"))
        == rows(graft.events.EventOps.funnel(ev, Seq("view", "click", "purchase"))))
      assert(rows(s2.sql("SELECT * FROM graft_scd2('events_view')"))
        == rows(graft.events.EventOps.scd2(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_decayed_score('events_view', 86400)"))
        == rows(graft.events.EventOps.decayedScore(ev, 86400000000L)))
      assert(rows(s2.sql("SELECT * FROM graft_mode('events_view', 'user_id', 'event_type')"))
        == rows(graft.operators.TableOps.modePerGroup(ev, "user_id", "event_type")))
      // sanity on semantics, not just parity: user 1's mode is the tied
      // smaller type
      val mode = s2.sql("SELECT * FROM graft_mode('events_view', 'user_id', 'event_type')")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(mode == Map(1L -> "view", 2L -> "view"))

      val fact = (1L to 50L).map(k => (k, k * 10)).toDF("fk", "payload")
      val keys = Seq(2L, 3L, 5L, 8L, 13L).toDF("kk")
      fact.createOrReplaceTempView("fact_view")
      keys.createOrReplaceTempView("keys_view")
      val sqlBloom = s2.sql(
        "SELECT fk, payload FROM graft_bloom_semijoin('fact_view', 'fk', 'keys_view', 'kk')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sqlBloom == Set(2L, 3L, 5L, 8L, 13L).map(k => (k, k * 10)))

      def rows2(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSeq
      assert(rows2(s2.sql(
          "SELECT * FROM graft_join_profile('fact_view', 'fk', 'keys_view', 'kk')"))
        == rows2(graft.operators.TableOps.joinProfile(fact, "fk", keys, "kk")))
      assert(rows2(s2.sql(
          "SELECT * FROM graft_histogram2d('fact_view', 'fk', 'payload', 7, 100)"))
        == rows2(graft.operators.TableOps.histogram2d(fact, "fk", "payload", 7L, 100L)))
    } finally {
      val shared = spark.asInstanceOf[ClassicSession]
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }

  test("graph/resample/profile TVFs match their Scala APIs") {
    spark.range(1).count()
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ClassicSession.clearDefaultSession()
    ClassicSession.clearActiveSession()
    val s2 = ClassicSession.builder()
      .master("local[2]")
      .withExtensions(ext)
      .getOrCreate()
    try {
      import s2.implicits._
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq

      val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L))
        .toDF("s", "d")
      edges.createOrReplaceTempView("edges_view")
      assert(rows(s2.sql("SELECT * FROM graft_pagerank('edges_view', 's', 'd', 3)"))
        == rows(graft.graph.PageRank.pageRank(edges, "s", "d", 3)))
      val prior = graft.graph.PageRank.pageRank(edges, "s", "d", 1)
      prior.createOrReplaceTempView("prior_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_pagerank_warm('edges_view', 's', 'd', 2, 'prior_view')"))
        == rows(graft.graph.PageRank.pageRank(edges, "s", "d", 3)))
      assert(rows(s2.sql("SELECT * FROM graft_triangles('edges_view', 's', 'd')"))
        == rows(graft.graph.Triangles.triangles(edges, "s", "d")))
      assert(rows(s2.sql("SELECT * FROM graft_hits('edges_view', 's', 'd', 2)"))
        == rows(graft.graph.Hits.hits(edges, "s", "d", 2)))
      val hitsPrior = graft.graph.Hits.hits(edges, "s", "d", 1)
      hitsPrior.createOrReplaceTempView("hits_prior_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_hits_warm('edges_view', 's', 'd', 2, 'hits_prior_view')"))
        == rows(graft.graph.Hits.hits(edges, "s", "d", 3)))
      val lpaPrior = graft.graph.LabelProp.labelPropagation(edges, "s", "d", 1)
      lpaPrior.createOrReplaceTempView("lpa_prior_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_label_prop_warm('edges_view', 's', 'd', 2, 'lpa_prior_view')"))
        == rows(graft.graph.LabelProp.labelPropagation(edges, "s", "d", 3)))
      val dsDf = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("a", 2L)).toDF("g", "u")
      dsDf.createOrReplaceTempView("ds_view")
      assert(rows(s2.sql("SELECT * FROM graft_distinct_sketch('ds_view', 'g', 'u', 2)"))
        == rows(graft.operators.DistinctSketch.summary(dsDf, Seq("g"), "u")))
      assert(rows(s2.sql("SELECT * FROM graft_distinct_registers('ds_view', 'g', 'u', 2)"))
        == rows(graft.operators.DistinctSketch.registers(dsDf, Seq("g"), "u")))
      val zDf = Seq((3L, 5L), (7L, 0L)).toDF("x", "y")
      zDf.createOrReplaceTempView("z_view")
      assert(rows(s2.sql("SELECT * FROM graft_zvalue('z_view', 'x,y', 21)"))
        == rows(zDf.withColumn("zval",
          graft.operators.Layout.zValue(Seq(zDf("x"), zDf("y")), 21))))
      val corpusDocs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val deltaDocs = Seq((2L, (1 to 20).map(i => s"w$i").mkString(" ")),
        (5L, (1 to 20).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
      val cSig = graft.text.Dedup.minhashSignatures(corpusDocs, 16)
      val dSig = graft.text.Dedup.minhashSignatures(deltaDocs, 16)
      cSig.createOrReplaceTempView("csig_view")
      dSig.createOrReplaceTempView("dsig_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_dedup_delta('csig_view', 'dsig_view', 16, 8, 2, 3, 4)"))
        == rows(graft.text.Dedup.dedupDelta(cSig, dSig, 16, 8, 2, 3, 4)))
      val seedsDf = Seq(1L).toDF("node")
      seedsDf.createOrReplaceTempView("seeds_view")
      assert(rows(s2.sql("SELECT * FROM graft_ppr('edges_view', 's', 'd', 'seeds_view', 'node', 2)"))
        == rows(graft.graph.PageRank.personalizedPageRank(edges, "s", "d", seedsDf, "node", 2)))
      assert(rows(s2.sql("SELECT * FROM graft_harmonic('edges_view', 's', 'd', 'seeds_view', 'node', 2)"))
        == rows(graft.graph.Centrality.harmonicCentrality(edges, "s", "d", seedsDf, "node", 2)))
      assert(rows(s2.sql("SELECT * FROM graft_ktruss('edges_view', 's', 'd', 3, 4)"))
        == rows(graft.graph.Truss.kTruss(edges, "s", "d", 3, 4)))
      val fdDf = Seq((1L, "a"), (2L, "a"), (2L, "b")).toDF("k", "s")
      fdDf.createOrReplaceTempView("fd_view")
      assert(rows(s2.sql("SELECT * FROM graft_fd_check('fd_view', 'k:s, s:k')"))
        == rows(graft.operators.TableOps.functionalDeps(fdDf, Seq(("k", "s"), ("s", "k")))))
      val outDf = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 50L)).toDF("g", "x")
      outDf.createOrReplaceTempView("out_view")
      assert(rows(s2.sql("SELECT * FROM graft_robust_outliers('out_view', 'g', 'x', 3)"))
        == rows(graft.operators.TableOps.robustOutliers(outDf, "g", "x", 3L)))
      val gapDf = Seq(1L, 2L, 7L).toDF("id")
      gapDf.createOrReplaceTempView("gap_view")
      assert(rows(s2.sql("SELECT * FROM graft_missing_ranges('gap_view', 'id')"))
        == rows(graft.operators.TableOps.missingRanges(gapDf, "id")))
      val chDf = Seq(1L, 9L).toDF("fk"); val paDf = Seq(1L, 2L).toDF("pk")
      chDf.createOrReplaceTempView("ch_view")
      paDf.createOrReplaceTempView("pa_view")
      assert(rows(s2.sql("SELECT * FROM graft_ref_check('ch_view', 'fk', 'pa_view', 'pk')"))
        == rows(graft.operators.Quality.referential(chDf, "fk", paDf, "pk")))
      val pcDf = Seq((4L, 3L), (3L, 2L)).toDF("c", "p")
      pcDf.createOrReplaceTempView("pc_view")
      assert(rows(s2.sql("SELECT * FROM graft_ancestors('pc_view', 'c', 'p', 3)"))
        == rows(graft.graph.Hierarchy.ancestors(pcDf, "c", "p", 3)))
      val factDf = Seq((4L, 10L), (3L, 5L), (9L, 7L)).toDF("k", "v")
      factDf.createOrReplaceTempView("rollfact_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_rollup_tree('pc_view', 'c', 'p', 3, 'rollfact_view', 'k', 'v')"))
        == rows(graft.graph.Hierarchy.rollupSum(pcDf, "c", "p", 3,
          factDf, "k", "v")))
      val bskDf = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L))
        .toDF("bk", "item")
      bskDf.createOrReplaceTempView("bsk_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_item_sim('bsk_view', 'bk', 'item', 2, 3)"))
        == rows(graft.operators.Association.itemSimilarity(bskDf,
          "bk", "item", 2L, 3)))
      val fifoBuys = Seq((1L, 10L, 5L, 1L), (1L, 11L, 3L, 2L))
        .toDF("g", "id", "q", "seq")
      val fifoSells = Seq((1L, 20L, 6L, 1L)).toDF("g", "id", "q", "seq")
      fifoBuys.createOrReplaceTempView("fifo_b_view")
      fifoSells.createOrReplaceTempView("fifo_s_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_fifo_match('fifo_b_view', 'fifo_s_view', 'g', 'id', 'q', 'seq', 4)"))
        == rows(graft.operators.Inventory.fifoMatch(fifoBuys, fifoSells,
          "g", "id", "q", "seq", 4L)))
      val prRows = Seq((1L, 1L, 1L), (1L, 2L, 2L)).toDF("g", "id", "w")
      val prTots = Seq((1L, 10L)).toDF("g", "t")
      prRows.createOrReplaceTempView("pr_rows_view")
      prTots.createOrReplaceTempView("pr_tots_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_prorate('pr_rows_view', 'g', 'id', 'w', 'pr_tots_view', 't')"))
        == rows(graft.operators.TableOps.prorate(prRows, "g", "id", "w",
          prTots, "t")))
      val zfDf = Seq(("a", 1L, 5L), ("a", 2L, -9L)).toDF("k", "o", "d")
      zfDf.createOrReplaceTempView("zf_view")
      assert(rows(s2.sql("SELECT * FROM graft_zero_floor('zf_view', 'k', 'o', 'd')"))
        == rows(graft.operators.TableOps.zeroFloorBalance(zfDf, "k", "o", "d")))
      val baseCl = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      val tgtCl = Seq((1L, "a"), (3L, "c")).toDF("k", "s")
      baseCl.createOrReplaceTempView("basecl_view")
      tgtCl.createOrReplaceTempView("tgtcl_view")
      assert(rows(s2.sql("SELECT * FROM graft_make_changelog('basecl_view', 'tgtcl_view', 'k', 1)"))
        == rows(graft.operators.TableOps.makeChangelog(baseCl, tgtCl, "k", 1L)))
      assert(rows(s2.sql("SELECT * FROM graft_link_predict('edges_view', 's', 'd', 10, 1)"))
        == rows(graft.graph.LinkPredict.commonNeighbors(edges, "s", "d", 10, 1L)))

      val runs = Seq(("q", 1L, 2), ("q", 2L, 1), ("q", 1L, 2)).toDF("q", "doc", "rank")
      runs.createOrReplaceTempView("runs_view")
      assert(rows(s2.sql("SELECT * FROM graft_rrf_fuse('runs_view', 'q', 'doc', 'rank', 10)"))
        == rows(graft.text.Retrieval.rrfFuse(runs, "q", "doc", "rank", 10)))
      val lbl = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "l")
      lbl.createOrReplaceTempView("lbl_view")
      assert(rows(s2.sql("SELECT * FROM graft_gini('lbl_view', 'g', 'l')"))
        == rows(graft.operators.TableOps.giniImpurity(lbl, "g", "l")))

      val ev = Seq((0L, 10L, 1L, "view", 1.0), (1L, 5000L, 1L, "click", 2.0),
        (2L, 40L, 2L, "view", 3.0))
        .map { case (id, s, u, ty, v) => (id, s * 1000000000L, u, ty, v) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      ev.createOrReplaceTempView("events_view2")
      assert(rows(s2.sql("SELECT * FROM graft_resample('events_view2', 3600)"))
        == rows(graft.events.EventOps.resample(ev, 3600000000L)))
      assert(rows(s2.sql("SELECT * FROM graft_ewma('events_view2', 3, 10, 32)"))
        == rows(graft.events.EventOps.ewma(ev, 3L, 10L, 32)))
      assert(rows(s2.sql("SELECT * FROM graft_attribution('events_view2', 'click', 'view', 3600)"))
        == rows(graft.events.EventOps.linearAttribution(ev, "click", Seq("view"), 3600000000L)))
      assert(rows(s2.sql("SELECT * FROM graft_position_attribution('events_view2', 'click', 'view', 3600)"))
        == rows(graft.events.EventOps.positionAttribution(ev, "click", Seq("view"), 3600000000L)))
      assert(rows(s2.sql("SELECT * FROM graft_cohort_ltv('events_view2', 'click')"))
        == rows(graft.events.EventOps.cohortLtv(ev, "click")))
      assert(rows(s2.sql("SELECT * FROM graft_session_intervals('events_view2', 1800)"))
        == rows(graft.events.EventOps.sessionIntervals(ev, 1800)))

      val sess = Seq((1L, 0L, 100L), (2L, 500L, 600L)).toDF("sid", "s_start", "s_end")
      val wins = Seq((10L, 50L, 550L)).toDF("wid", "w_start", "w_end")
      sess.createOrReplaceTempView("sess_view")
      wins.createOrReplaceTempView("win_view")
      assert(rows(s2.sql("""SELECT * FROM graft_interval_overlap('sess_view',
          's_start', 's_end', 'win_view', 'w_start', 'w_end', 64)"""))
        == rows(graft.events.RangeJoin.intervalOverlap(
          sess, "s_start", "s_end", wins, "w_start", "w_end", 64L)))

      val vals = Seq(3L, 17L, 25L, -4L).toDF("v")
      vals.createOrReplaceTempView("vals_view")
      assert(rows(s2.sql("SELECT * FROM graft_histogram('vals_view', 'v', 10)"))
        == rows(graft.operators.TableOps.histogram(vals, "v", 10L)))

      val tab = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("k", "g")
      tab.createOrReplaceTempView("tab_view")
      assert(rows(s2.sql("SELECT * FROM graft_profile('tab_view', 'k,g')"))
        == rows(graft.operators.TableOps.profile(tab, Seq("k", "g"))))
      assert(rows(s2.sql("SELECT * FROM graft_profile_batched('tab_view', 'k,g')"))
        == rows(graft.operators.TableOps.profileBatched(tab, Seq("k", "g"))))

      val xy = Seq(("g", 0L, 7L), ("g", 2L, 13L), ("g", 5L, 22L)).toDF("g", "x", "y")
      xy.createOrReplaceTempView("xy_view")
      assert(rows(s2.sql("SELECT * FROM graft_linreg('xy_view', 'g', 'x', 'y')"))
        == rows(graft.operators.TableOps.linregStats(xy, "g", "x", "y")))

      val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      val chg = Seq((1L, 11L, "U", 1L), (2L, 0L, "D", 1L)).toDF("k", "v", "op", "seq")
      base.createOrReplaceTempView("base_view")
      chg.createOrReplaceTempView("changes_view")
      assert(rows(s2.sql("SELECT * FROM graft_cdc_merge('base_view', 'changes_view', 'k')"))
        == rows(graft.operators.TableOps.applyChangelog(base, chg, "k")))
      val nw2 = Seq((1L, 11L), (2L, 20L)).toDF("k", "v")
      nw2.createOrReplaceTempView("nw2_view")
      assert(rows(s2.sql("SELECT * FROM graft_diff_columns('base_view', 'nw2_view', 'k')"))
        == rows(graft.operators.TableOps.snapshotDiffColumns(base, nw2, "k")))
      assert(rows(s2.sql("SELECT * FROM graft_type_ngrams('events_view2', 2)"))
        == rows(graft.events.EventOps.typeNgrams(ev, 2)))
      assert(rows(s2.sql("SELECT * FROM graft_streaks('events_view2')"))
        == rows(graft.events.EventOps.activityStreaks(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_twap('events_view2')"))
        == rows(graft.events.EventOps.timeWeightedAvg(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_cusum('events_view2', 86400)"))
        == rows(graft.events.EventOps.cusumChangepoint(ev)))
      assert(rows(s2.sql(
          "SELECT * FROM graft_rolling_anomaly('events_view2', 86400, 7, 30)"))
        == rows(graft.events.EventOps.rollingAnomaly(ev)))
      assert(rows(s2.sql(
          "SELECT * FROM graft_funnel_latency('events_view2', 'view,click,purchase')"))
        == rows(graft.events.EventOps.funnelLatency(ev,
          Seq("view", "click", "purchase"))))
      assert(rows(s2.sql("SELECT * FROM graft_seasonality('events_view2', 86400, 7)"))
        == rows(graft.events.EventOps.seasonalProfile(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_period_deltas('events_view2', 86400, 7)"))
        == rows(graft.events.EventOps.periodDeltas(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_equidepth_scores('xy_view', 'x,y', 2)"))
        == rows(graft.operators.TableOps.equiDepthScores(xy, Seq("x", "y"), 2)))
      assert(rows(s2.sql("SELECT * FROM graft_lag_stats('events_view2', 86400, 3)"))
        == rows(graft.events.EventOps.lagStats(ev, maxLag = 3)))
      assert(rows(s2.sql("SELECT * FROM graft_rolling_median('events_view2', 86400, 7)"))
        == rows(graft.events.EventOps.rollingMedian(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_dense_series('events_view2', 86400)"))
        == rows(graft.events.EventOps.denseSeries(ev)))
      assert(rows(s2.sql("SELECT * FROM graft_velocity('events_view2', 600, 2)"))
        == rows(graft.events.EventOps.velocity(ev, 600000000L, 2L)))
      assert(rows(s2.sql("SELECT * FROM graft_cumulative_users('events_view2', 86400)"))
        == rows(graft.events.EventOps.cumulativeUsers(ev)))
      val dimScd = graft.events.EventOps.scd2(ev)
      val probesScd = graft.events.EventOps.scd2(ev)
        .selectExpr("user_id", "valid_from_us AS tus")
      dimScd.createOrReplaceTempView("scd_dim_view")
      probesScd.createOrReplaceTempView("scd_probe_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_scd2_lookup('scd_dim_view', 'scd_probe_view', 'user_id', 'tus')"))
        == rows(graft.events.EventOps.scd2Lookup(dimScd, probesScd,
          "user_id", "tus")))
      assert(rows(s2.sql("SELECT * FROM graft_holt('events_view2', 3, 10, 1, 10)"))
        == rows(graft.events.EventOps.holtSmooth(ev, 3L, 10L, 1L, 10L)))
      val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 50L, 50L))
        .toDF("pid", "px", "py")
      pts.createOrReplaceTempView("pts_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_radius_join('pts_view', 'pid', 'px', 'py', 6)"))
        == rows(graft.operators.Spatial.radiusJoin(pts, "pid", "px", "py", 6L)))
      assert(rows(s2.sql(
          "SELECT * FROM graft_nearest_within('pts_view', 'pid', 'px', 'py', 6)"))
        == rows(graft.operators.Spatial.nearestNeighbor(pts, "pid", "px", "py", 6L)))
      val zdocs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
      zdocs.createOrReplaceTempView("zdocs_view")
      assert(rows(s2.sql("SELECT * FROM graft_zipf('zdocs_view', 1)"))
        == rows(graft.text.Ngrams.zipfProfile(zdocs, 1L)))
      assert(rows(s2.sql("SELECT * FROM graft_abc('xy_view', 'g', 'y', 80, 95)"))
        == rows(graft.operators.TableOps.abcAnalysis(xy, "g", "y")))
      assert(rows(s2.sql("SELECT * FROM graft_topk_others('xy_view', 'g', 'x', 'y', 1)"))
        == rows(graft.operators.TableOps.topKWithOthers(xy, "g", "x", "y", 1)))
      val vecs = Seq((1L, Array(0.5f, -0.25f)), (2L, Array(1.5f, 0.75f)))
        .toDF("vec_id", "embedding")
      vecs.createOrReplaceTempView("vecs_view")
      assert(rows(s2.sql("SELECT * FROM graft_vec_stats('vecs_view', 'embedding', 2)"))
        == rows(graft.embed.VecStats.perDimStats(vecs, "embedding", 2)))
      assert(rows(s2.sql("SELECT * FROM graft_assortativity('edges_view', 's', 'd')"))
        == rows(graft.graph.Assortativity.degreeAssortativity(edges, "s", "d")))
      assert(rows(s2.sql(
          "SELECT * FROM graft_weighted_sample('xy_view', 'y', 2, 'x')"))
        == rows(graft.operators.Sampling.systematicWeighted(
          xy, "y", 2, org.apache.spark.sql.functions.col("x"))))
      assert(rows(s2.sql(
          "SELECT * FROM graft_quantile_summary('xy_view', 'g', 'y', '1/4,1/2,3/4')"))
        == rows(graft.operators.TableOps.quantileSummary(xy, "g", "y",
          Seq((1, 4), (1, 2), (3, 4)))))
      val units = Seq(("a", 1L), ("a", 0L), ("b", 1L), ("b", 1L),
        ("ctl", 1L), ("ctl", 0L)).toDF("variant", "cv")
      units.createOrReplaceTempView("units_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_ab_report('units_view', 'variant', 'cv', 'ctl')"))
        == rows(graft.operators.Experiment.abReport(units, "variant", "cv", "ctl")))
      assert(rows(s2.sql("SELECT * FROM graft_sliding_distinct('events_view2', 7)"))
        == rows(graft.events.EventOps.slidingDistinctUsers(ev, 7)))
      val chg2 = Seq((2L, 21L, "U", 1L), (3L, 30L, "U", 1L)).toDF("k", "v", "op", "seq")
      chg2.createOrReplaceTempView("changes2_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_cdc_compact('base_view', 'changes_view,changes2_view', 'k')"))
        == rows(graft.operators.TableOps.applyChangelogs(base, Seq(chg, chg2), "k")))
      assert(rows(s2.sql("SELECT * FROM graft_mad('xy_view', 'g', 'y')"))
        == rows(graft.operators.TableOps.madPerGroup(xy, "g", "y")))
      assert(rows(s2.sql("SELECT * FROM graft_kcore('edges_view', 's', 'd', 2, 10)"))
        == rows(graft.graph.KCore.kCore(edges, "s", "d", 2, 10)))
      assert(rows(s2.sql("SELECT * FROM graft_label_prop('edges_view', 's', 'd', 2)"))
        == rows(graft.graph.LabelProp.labelPropagation(edges, "s", "d", 2)))
      assert(rows(s2.sql("SELECT * FROM graft_clustering_coeff('edges_view', 's', 'd')"))
        == rows(graft.graph.Triangles.clusteringCoefficient(edges, "s", "d")))
      assert(rows(s2.sql("SELECT * FROM graft_graph_profile('edges_view', 's', 'd')"))
        == rows(graft.graph.GraphProfile.profile(edges, "s", "d")))
      assert(rows(s2.sql("SELECT * FROM graft_percent_ranks('xy_view', 'g', 'y')"))
        == rows(graft.operators.TableOps.percentRanks(xy, "g", "y")))
      assert(rows(s2.sql("SELECT * FROM graft_minmax_scale('xy_view', 'g', 'y', 1000000)"))
        == rows(graft.operators.TableOps.minmaxScale(xy, "g", "y")))
      assert(rows(s2.sql("SELECT * FROM graft_equidepth('xy_view', 'y', 2)"))
        == rows(graft.operators.TableOps.equiDepthBuckets(xy, "y", 2)))
      assert(rows(s2.sql("SELECT * FROM graft_corr_pairs('xy_view', 'x,y')"))
        == rows(graft.operators.TableOps.corrPairs(xy, Seq("x", "y"))))
      assert(rows(s2.sql("SELECT * FROM graft_melt('xy_view', 'g', 'x,y')"))
        == rows(graft.operators.TableOps.melt(xy, Seq("g"), Seq("x", "y"))))
      assert(rows(s2.sql("SELECT * FROM graft_frequent_pairs('tab_view', 'g', 'k', 1)"))
        == rows(graft.operators.Association.frequentPairs(tab, "g", "k", 1L)))
      assert(rows(s2.sql("SELECT * FROM graft_winsorize('xy_view', 'g', 'y', 1, 2, 4)"))
        == rows(graft.operators.TableOps.winsorize(xy, "g", "y", 1, 2, 4)))
      assert(rows(s2.sql(
          """SELECT * FROM graft_expectations('tab_view',
            |  'not_null:k;unique:k;accepted:g=a|b;range:k=1..2')""".stripMargin))
        == rows(graft.operators.Quality.expectations(tab, Seq(
          graft.operators.Quality.ExpectNotNull("k"),
          graft.operators.Quality.ExpectUnique("k"),
          graft.operators.Quality.ExpectAccepted("g", Seq("a", "b")),
          graft.operators.Quality.ExpectRange("k", 1L, 2L)))))
      assert(rows(s2.sql("SELECT * FROM graft_agg_state('xy_view', 'g', 'y')"))
        == rows(graft.operators.TableOps.aggState(xy, "g", "y")))
      assert(rows(s2.sql("SELECT * FROM graft_skyline('xy_view', 'x', 'y')"))
        == rows(graft.operators.Skyline.pareto2d(xy, "x", "y")))
      val xyz = Seq((1L, 5L, 1L, 2L), (2L, 3L, 4L, 4L), (3L, 1L, 9L, 1L),
        (4L, 2L, 3L, 3L)).toDF("id", "x", "y", "z")
      xyz.createOrReplaceTempView("xyz_view")
      assert(rows(s2.sql("SELECT * FROM graft_skyline3d('xyz_view', 'x', 'y', 'z')"))
        == rows(graft.operators.Skyline.pareto3d(xyz, "x", "y", "z")))
      assert(rows(s2.sql(
          "SELECT * FROM graft_qsketch('xy_view', 'g', 'y', 0, 30, 30, '1/2,9/10')"))
        == rows(graft.operators.QuantileSketch.summary(xy, Seq("g"), "y",
          0L, 30L, 30, Seq((1, 2), (9, 10)))))
      assert(rows(s2.sql(
          "SELECT * FROM graft_logsketch('xy_view', 'g', 'y', 2, '1/2,9/10')"))
        == rows(graft.operators.LogQuantileSketch.summary(xy, Seq("g"), "y",
          2, Seq((1, 2), (9, 10)))))
      assert(rows(s2.sql("SELECT * FROM graft_qsketch_weighted(" +
          "'xy_view', 'g', 'y', 'x', 0, 30, 30, '1/2')"))
        == rows(graft.operators.QuantileSketch.summary(xy, Seq("g"), "y",
          0L, 30L, 30, Seq((1, 2)), weightCol = Some("x"))))
      assert(rows(s2.sql("SELECT * FROM graft_logsketch_weighted(" +
          "'xy_view', 'g', 'y', 'x', 2, '1/2')"))
        == rows(graft.operators.LogQuantileSketch.summary(xy, Seq("g"), "y",
          2, Seq((1, 2)), weightCol = Some("x"))))
      // malformed quantile lists fail with the argument-error shape
      // (named grammar), not an opaque MatchError
      for (bad <- Seq("0.5", "1/2/3", "a/b", "")) {
        val e = intercept[Exception](s2.sql(
          s"SELECT * FROM graft_qsketch('xy_view', 'g', 'y', 0, 30, 30, '$bad')"))
        def m(t: Throwable): String =
          Option(t).map(x => x.getMessage + m(x.getCause)).getOrElse("")
        assert(m(e).contains("num/den"), s"'$bad': ${m(e)}")
      }
      val st = graft.operators.TableOps.aggState(xy, "g", "y")
      st.createOrReplaceTempView("st_view")
      assert(rows(s2.sql(
          "SELECT * FROM graft_merge_agg_states('st_view', 'st_view', 'g')"))
        == rows(graft.operators.TableOps.mergeAggStates(st, st, "g")))
      val seeds = Seq(1L).toDF("n")
      seeds.createOrReplaceTempView("seeds_view")
      assert(rows(s2.sql("SELECT * FROM graft_bfs('edges_view', 's', 'd', 'seeds_view', 'n', 3)"))
        == rows(graft.graph.Bfs.hopDistance(edges, "s", "d", seeds, "n", 3)))
      val wEdges = edges.withColumn("w", expr("1L + (s + d) % 3"))
      wEdges.createOrReplaceTempView("wedges_view")
      assert(rows(s2.sql("SELECT * FROM graft_sssp('wedges_view', 's', 'd', 'w', 'seeds_view', 'n', 3)"))
        == rows(graft.graph.Bfs.shortestPaths(wEdges, "s", "d", Some("w"), seeds, "n", 3)))
    } finally {
      val shared = spark.asInstanceOf[ClassicSession]
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }

  test("register() is idempotent and quiet on repeat calls") {
    graft.functions.DotProductLong.register(spark)
    graft.functions.DotProductLong.register(spark) // second call: no replace
    graft.functions.SortedIntersectCount.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    val v = spark.sql("SELECT dot_long(array(2L), array(21L))").collect()(0).getLong(0)
    assert(v == 42L)
  }
}

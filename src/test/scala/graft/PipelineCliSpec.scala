package graft

class PipelineCliSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end pipeline: filters, dedups, splits, shards; deterministic re-run") {
    // a corpus with: clean docs, one exact-dup triple (near-dedup collapses
    // it), and one boilerplate doc the repetition ceiling drops
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // per-doc vocab is mostly unique so genuinely distinct docs stay
    // distinct under the 0.8 word-set Jaccard (a shared template with one
    // varying token WOULD merge — that's the operator working, not a bug)
    val rows = (1L to 30L).map(i =>
      (i, s"item${i}a item${i}b item${i}c item${i}d item${i}e " +
        s"item${i}f item${i}g item${i}h item${i}i item${i}j")) ++
      Seq(101L -> base, 102L -> base, 103L -> base,
        200L -> ("spam spam " * 12).trim,
        // PII fixture: redaction must run on RAW text — normalize strips
        // '@'/'.'/'-' and would make the patterns unmatchable
        300L -> ("reach out to alice@example.com or call 555-123-4567 " +
          "about the quarterly numbers and the rest of the agenda items"))
    val docs = rows.toDF("doc_id", "text")

    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 300L, maxDupFrac1000 = 300L)
    val c = counts.toMap
    assert(c("input") == 35L)
    assert(c("after_quality_filters") < 35L, s"boilerplate not dropped: $counts")
    // the dup triple collapses to one representative
    assert(c("after_near_dedup") == c("after_quality_filters") - 2, s"$counts")
    assert(c("split_train") + c("split_val") + c("split_test") == c("after_near_dedup"))

    // no raw PII survives into ANY split, and the redaction placeholders
    // (normalized to plain tokens) prove the pass actually ran on doc 300
    val allText = bySplit.values.flatMap(_.collect().map(r =>
      r.getLong(0) -> r.getString(1))).toMap
    allText.values.foreach { t =>
      assert(!t.contains("example") && !t.contains("555"),
        s"raw PII leaked into a shard: $t")
    }
    assert(allText.contains(300L), // forall alone would pass VACUOUSLY if
      s"the PII doc never reached a split: ${allText.keys}") // a filter ate doc 300
    assert(allText(300L).contains("email") && allText(300L).contains("phone"),
      s"doc 300 lost its redaction placeholders: ${allText(300L)}")

    // the returned frames are persisted and materialized: consuming them
    // must scan the cache, not re-execute the normalize→dedup lineage
    // (the round-4 ~4-full-passes regression this guards against)
    val trainPlan = bySplit("train").queryExecution.executedPlan.toString
    assert(trainPlan.contains("InMemoryTableScan") ||
      trainPlan.contains("TableCacheQueryStage"), trainPlan)

    // shards: write train, re-read, exact row parity
    val out = java.nio.file.Files.createTempDirectory("pipe").toString
    graft.sources.Layout.saveShards(bySplit("train"), s"$out/train", "doc_id", 8)
    val reread = spark.read.parquet(s"$out/train")
    assert(reread.count() == c("split_train"))

    // determinism: the whole pipeline re-runs to identical splits
    val (bySplit2, counts2) = PipelineCli.run(docs, minQuality = 300L, maxDupFrac1000 = 300L)
    assert(counts2 == counts)
    val a = bySplit("train").collect().map(_.getLong(0)).sorted
    val b = bySplit2("train").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // the run() contract: callers unpersist the returned frames — honor it
    // so this suite doesn't hold 6 cached frames in the shared session
    (bySplit.values ++ bySplit2.values).foreach(_.unpersist())
  }

  test("optional eval decontamination drops embedded-span docs; blocklist is normalization-aligned") {
    import org.apache.spark.sql.functions.col
    val rows = (1L to 20L).map(i =>
      (i, s"item${i}a item${i}b item${i}c item${i}d item${i}e " +
        s"item${i}f item${i}g item${i}h item${i}i item${i}j")) ++ Seq(
      // embeds the eval span (8 tokens) inside otherwise-novel text
      400L -> ("wrapper opening words precede alpha beta gamma delta " +
        "epsilon zeta eta theta and then trailing novel words follow here"))
    val docs = rows.toDF("doc_id", "text")
    // UPPERCASE in the blocklist: the stage must normalize the blocklist
    // exactly like the corpus or the span never matches
    val blocklist = Seq(900L -> "ALPHA beta gamma delta epsilon zeta eta theta")
      .toDF("doc_id", "text")

    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 300L,
      maxDupFrac1000 = 300L, evalBlocklist = Some(blocklist))
    val c = counts.toMap
    assert(c("after_decontamination") == c("after_quality_filters") - 1, s"$counts")
    val ids = bySplit.values.flatMap(_.collect().map(_.getLong(0))).toSet
    assert(!ids.contains(400L), "contaminated doc reached a split")
    assert(ids.contains(1L), "clean docs must survive decontamination")

    // without a blocklist the same doc flows through — the stage is the
    // only thing that drops it (guards against a filter eating doc 400
    // and the assertion above passing vacuously)
    val (bySplit0, counts0) = PipelineCli.run(docs, minQuality = 300L,
      maxDupFrac1000 = 300L)
    assert(!counts0.toMap.contains("after_decontamination"))
    val ids0 = bySplit0.values.flatMap(_.collect().map(_.getLong(0))).toSet
    assert(ids0.contains(400L))
    (bySplit.values ++ bySplit0.values).foreach(_.unpersist())
  }

  test("ordered-train stage: shard order matches interleaveBySource; shuffle fallback") {
    import org.apache.spark.sql.functions.col
    // enough distinct docs across two sources that the interleave order is
    // non-trivial; vocab unique per doc so dedup keeps them all
    val rows = (1L to 40L).map { i =>
      (i, s"item${i}a item${i}b item${i}c item${i}d item${i}e " +
        s"item${i}f item${i}g item${i}h item${i}i item${i}j",
        if (i % 3 == 0) "web" else "books")
    }
    val docs = rows.toDF("doc_id", "text", "source")

    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 300L,
      maxDupFrac1000 = 300L, orderTrain = true)
    val c = counts.toMap
    assert(c.contains("train_ordered_interleave"), s"stage row missing: $counts")
    assert(c("train_ordered_interleave") == c("split_train"), s"$counts")
    val train = bySplit("train")
    assert(train.columns.toSeq == Seq("pos", "doc_id", "text"))

    // the frame's order-by-pos must equal the operator applied to the
    // SAME final train (doc_id, source) set
    val got = train.orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val trainIds = train.select("doc_id")
    val expect = graft.text.Pipeline.interleaveBySource(
        docs.select(col("doc_id"), col("source")).join(trainIds, "doc_id"))
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, "ordered train frame diverges from interleaveBySource")

    // shards written sorted by pos re-read in the operator's order
    val out = java.nio.file.Files.createTempDirectory("pipeord").toString
    graft.sources.Layout.saveShards(train, s"$out/train", "pos", 8)
    val reread = spark.read.parquet(s"$out/train")
      .orderBy("pos").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(reread == expect)

    // no source column → hash-shuffle fallback, matching trainingOrder
    val noSrc = rows.map { case (i, t, _) => (i, t) }.toDF("doc_id", "text")
    val (bySplit2, counts2) = PipelineCli.run(noSrc, minQuality = 300L,
      maxDupFrac1000 = 300L, orderTrain = true)
    assert(counts2.toMap.contains("train_ordered_shuffle"), s"$counts2")
    val got2 = bySplit2("train").orderBy("pos").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect2 = graft.text.Pipeline.trainingOrder(bySplit2("train").select("doc_id"))
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == expect2)

    (bySplit.values ++ bySplit2.values).foreach(_.unpersist())
  }

  test("CLI arg parsing: '-' placeholders keep later positional args reachable") {
    // defaults
    val d = PipelineCli.parseArgs(Array("in.parquet", "out"))
    assert(d == PipelineCli.Args("in.parquet", "out", 400L, 300L, 100000L, None,
      orderTrain = false, spanDedupN = None))
    // a real blocklist path is kept
    val bl = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "bl.parquet"))
    assert(bl.blocklistPath.contains("bl.parquet") && !bl.orderTrain)
    // '-' means no blocklist, but the positional 'ordered' flag still parses
    val ord = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "-", "ordered"))
    assert(ord.blocklistPath.isEmpty && ord.orderTrain)
    // blocklist + ordered together
    val both = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "bl", "ordered"))
    assert(both.blocklistPath.contains("bl") && both.orderTrain)
    // '-' in the ordered slot reaches spanDedupN unordered
    val sp = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "-", "-", "8"))
    assert(sp == PipelineCli.Args("in", "out", 100L, 200L, 50L, None,
      orderTrain = false, spanDedupN = Some(8)))
    // all three optional stages at once
    val full = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "bl", "ordered", "4"))
    assert(full.blocklistPath.contains("bl") && full.orderTrain &&
      full.spanDedupN.contains(4))
    // a malformed 7th arg fails loudly, not silently-unordered
    intercept[IllegalArgumentException] {
      PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "-", "orderd"))
    }
    // a degenerate span size fails loudly
    intercept[IllegalArgumentException] {
      PipelineCli.parseArgs(Array("in", "out", "100", "200", "50", "-", "-", "1"))
    }
  }

  test("classifier-score → per-group quantile filter → survivor-policy dedup: kept set ≡ the manual operator chain, best-scored duplicate survives") {
    import org.apache.spark.sql.functions._
    // uniform weight-1 buckets make the classifier score = n_tokens —
    // deterministic without knowing the hash, so the fixture can plant a
    // LONGER (higher-scored) near-duplicate that the survivor policy must
    // keep over the min-id member the default policy would pick
    val longDoc = (i: Long) => s"item${i}a item${i}b item${i}c item${i}d " +
      s"item${i}e item${i}f item${i}g item${i}h item${i}i item${i}j"
    val dupText = longDoc(101L)
    val rows = (1L to 20L).map(i =>
      (i, longDoc(i), if (i % 2 == 1) "web" else "books")) ++ Seq(
      // short docs (score 5): each group's 1/6-quantile threshold is 10,
      // so these are exactly what the fraction-budgeted filter drops
      (31L, "short31a short31b short31c short31d short31e", "web"),
      (32L, "short32a short32b short32c short32d short32e", "books"),
      (33L, "short33a short33b short33c short33d short33e", "web"),
      (34L, "short34a short34b short34c short34d short34e", "books"),
      // planted near-dup cluster (identical word SET → Jaccard 1): 103's
      // doubled text scores 20 vs 10, so bestkeep must keep 103, not 101
      (101L, dupText, "web"), (102L, dupText, "web"),
      (103L, s"$dupText $dupText", "web"))
    val docs = rows.toDF("doc_id", "text", "source")
    val weights = spark.range(4096).select(col("id").as("bucket"),
      lit(1L).as("w_permille"))

    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 0L,
      maxDupFrac1000 = 1000L, classifierWeights = Some(weights),
      keepQuantile = Some((1, 6)), quantileGroupCol = Some("source"),
      survivorPolicy = true)
    val c = counts.toMap
    assert(c.contains("scored") && c("scored") == 27L, s"$counts")
    assert(c.contains("after_quantile_filter"), s"$counts")
    val ids = bySplit.values.flatMap(_.collect().map(_.getLong(0))).toSet

    // the planted best-scored duplicate survives; its cluster-mates don't
    assert(ids.contains(103L), s"best-scored near-dup lost: $ids")
    assert(!ids.contains(101L) && !ids.contains(102L),
      s"survivor policy kept a lower-scored cluster member: $ids")
    // the short docs fall below each group's quantile threshold
    assert(Seq(31L, 32L, 33L, 34L).forall(!ids.contains(_)),
      s"sub-threshold docs survived the quantile filter: $ids")
    assert(ids.contains(1L) && ids.contains(2L))

    // ground truth: the SAME operator chain composed by hand
    val redacted = graft.text.Pipeline.normalize(
        graft.text.Pipeline.redactPii(docs)
          .select(col("doc_id"), col("red_text").as("text")))
      .select(col("doc_id"), col("norm_text").as("text"))
    val scores = graft.text.TextAnalysis.scoreHashedLinear(redacted, weights, 4096)
      .select(col("doc_id"), col("logit_permille").as("__score"))
    // minQuality=0 and maxDupFrac=1000 make the floors no-ops on this
    // fixture, so the chain starts at the quantile filter
    val kept = graft.text.Pipeline.filterByQuantilePerGroup(
        redacted.join(scores, "doc_id")
          .join(docs.select(col("doc_id"), col("source")), "doc_id"),
        "__score", "source", 1, 6)
      .select("doc_id", "text")
    val reps = graft.text.Dedup.bestPerCluster(
        graft.text.Dedup.nearDedup(kept), scores, "__score")
      .select(col("rep_doc").as("doc_id"))
    val want = kept.join(reps, "doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == want, s"CLI kept set diverges from the operator chain: " +
      s"cli-only=${ids -- want} chain-only=${want -- ids}")
    assert(c("after_quantile_filter") == kept.count(), s"$counts")
    assert(c("after_near_dedup") == want.size.toLong, s"$counts")
    bySplit.values.foreach(_.unpersist())
  }

  test("quantile/survivor stages without a classifier fall back to the heuristic quality score") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 12L).map(i =>
      (i, s"item${i}a item${i}b item${i}c item${i}d item${i}e " +
        s"item${i}f item${i}g item${i}h item${i}i item${i}j"))
    val docs = rows.toDF("doc_id", "text")
    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 0L,
      maxDupFrac1000 = 1000L, keepQuantile = Some((1, 4)))
    val c = counts.toMap
    assert(c.contains("scored") && c.contains("after_quantile_filter"), s"$counts")
    // uniform-quality fixture: the 1/4-quantile threshold equals every
    // doc's score, so >= keeps all — the stage ran and dropped nothing
    assert(c("after_quantile_filter") == c("after_quality_filters"), s"$counts")
    bySplit.values.foreach(_.unpersist())
    // a group column without a fraction is a loud error, not a silent skip
    intercept[IllegalArgumentException] {
      PipelineCli.run(docs, 0L, 1000L, quantileGroupCol = Some("source"))
    }
    // a group column absent from the input is a loud error too
    intercept[IllegalArgumentException] {
      PipelineCli.run(docs, 0L, 1000L, keepQuantile = Some((1, 4)),
        quantileGroupCol = Some("nope"))
    }
  }

  test("CLI arg parsing: weights/quantile/bestkeep slots") {
    val w = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50",
      "-", "-", "-", "w.parquet@8192", "7/10@source", "bestkeep"))
    assert(w.weightsPath.contains("w.parquet") && w.weightsDim == 8192)
    assert(w.keepQuantile.contains((7, 10)) && w.quantileGroup.contains("source"))
    assert(w.bestKeep && w.spanDedupN.isEmpty)
    val plain = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50",
      "-", "-", "4", "w.parquet", "7/10", "-"))
    assert(plain.weightsPath.contains("w.parquet") && plain.weightsDim == 4096)
    assert(plain.keepQuantile.contains((7, 10)) && plain.quantileGroup.isEmpty)
    assert(!plain.bestKeep && plain.spanDedupN.contains(4))
    // '-' everywhere leaves all three stages off
    val off = PipelineCli.parseArgs(Array("in", "out", "100", "200", "50",
      "-", "-", "-", "-", "-", "-"))
    assert(off.weightsPath.isEmpty && off.keepQuantile.isEmpty && !off.bestKeep)
    // malformed fraction and flag fail loudly
    intercept[IllegalArgumentException] {
      PipelineCli.parseArgs(Array("in", "out", "100", "200", "50",
        "-", "-", "-", "-", "seven-tenths", "-"))
    }
    intercept[IllegalArgumentException] {
      PipelineCli.parseArgs(Array("in", "out", "100", "200", "50",
        "-", "-", "-", "-", "-", "bestkep"))
    }
  }

  test("span-dedup stage: cross-doc boilerplate is edited out, emptied docs drop") {
    // distinct docs sharing an identical 4-token boilerplate tail: near-dedup
    // keeps all (word-set Jaccard is low), the span stage must strip the
    // repeated tail from every doc but the first
    val tail = "copyright footer legal notice"
    val rows = (1L to 20L).map(i =>
      (i, s"body${i}a body${i}b body${i}c body${i}d body${i}e body${i}f $tail")) ++
      // a doc that IS only boilerplate: fully covered → dropped by the stage
      Seq(100L -> s"$tail $tail")
    val docs = rows.toDF("doc_id", "text")
    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 0L,
      maxDupFrac1000 = 1000L, spanDedupN = Some(4))
    val c = counts.toMap
    assert(c.contains("after_span_dedup"), s"$counts")
    assert(c("after_span_dedup") < c("after_near_dedup"), s"$counts")
    val allText = bySplit.values.flatMap(_.collect().map(r =>
      r.getLong(0) -> r.getString(1))).toMap
    assert(!allText.contains(100L), "pure-boilerplate doc survived")
    // exactly one survivor still carries the boilerplate (the keep-first copy)
    val carriers = allText.values.count(_.contains(tail))
    assert(carriers == 1, s"expected 1 boilerplate carrier, got $carriers")
    // body tokens survive the rewrite
    assert(allText.values.forall(_.nonEmpty))
    assert(c("split_train") + c("split_val") + c("split_test") == c("after_span_dedup"))
    bySplit.values.foreach(_.unpersist())
  }

  test("stage 0 expectations: report counts violations, contract rows are enforced") {
    // clean corpus + every violation class: a NULL id, a NULL text, and a
    // duplicated id (two DIFFERENT texts — the case that would otherwise
    // row-multiply every later doc_id join)
    val clean = (1L to 25L).map(i =>
      (Option(i), Option(s"tok${i}a tok${i}b tok${i}c tok${i}d tok${i}e " +
        s"tok${i}f tok${i}g tok${i}h tok${i}i tok${i}j")))
    val dirty = Seq(
      (None: Option[Long], Option("orphan text with no identifier at all here")),
      (Option(500L), None: Option[String]),
      (Option(600L), Option("dupa dupb dupc dupd dupe dupf dupg duph dupi dupj")),
      (Option(600L), Option("dupk dupl dupm dupn dupo dupp dupq dupr dups dupt")))
    val docs = (clean ++ dirty).toDF("doc_id", "text")
    val (bySplit, counts) = PipelineCli.run(docs, minQuality = 0L,
      maxDupFrac1000 = 1000L)
    val c = counts.toMap
    assert(c("input") == 29L, s"$counts")
    assert(c("expect_not_null_doc_id") == 1L, s"$counts")
    assert(c("expect_not_null_text") == 1L, s"$counts")
    assert(c("expect_unique_doc_id") == 1L, s"$counts")
    val allRows = bySplit.values.flatMap(_.collect().map(r =>
      r.getLong(0) -> r.getString(1))).toSeq
    // contract enforced: no NULL-contract rows downstream, the dup id
    // appears ONCE with the deterministic (smallest-text) survivor
    assert(allRows.count(_._1 == 600L) == 1, s"dup id multiplied: $allRows")
    assert(allRows.find(_._1 == 600L).get._2.startsWith("dupa"))
    assert(!allRows.exists(_._1 == 500L), "null-text row survived")
    assert(c("split_train") + c("split_val") + c("split_test") == c("after_near_dedup"))
    bySplit.values.foreach(_.unpersist())

    // non-vacuous control: a clean corpus reports all-zero violations and
    // takes the zero-cost path (no dedup window, no filter)
    val cleanDocs = clean.toDF("doc_id", "text")
    val (bySplit2, counts2) = PipelineCli.run(cleanDocs, minQuality = 0L,
      maxDupFrac1000 = 1000L)
    val c2 = counts2.toMap
    assert(c2("expect_not_null_doc_id") == 0L && c2("expect_not_null_text") == 0L
      && c2("expect_unique_doc_id") == 0L, s"$counts2")
    assert(c2("input") == 25L)
    bySplit2.values.foreach(_.unpersist())
  }

  test("stage report: score sketch rides the report and rolls up across shards") {
    import graft.operators.QuantileSketch
    import org.apache.spark.sql.functions.col
    // two disjoint corpus "shards" and their union — the fleet scenario:
    // each shard's pipeline run emits its own report; a dashboard rolls
    // the reports up WITHOUT revisiting any rows
    val rows = (1L to 24L).map(i =>
      (i, (1 to 8).map(j => s"tok${i}w$j").mkString(" ")))
    val (a, b) = rows.splitAt(12)
    val slots = QuantileSketch.slots(PipelineCli.ScoreSketchBins)
    def reportSketch(rs: Seq[(Long, String)]): Seq[Long] = {
      val (bySplit, counts) = PipelineCli.run(rs.toDF("doc_id", "text"),
        minQuality = 0L, maxDupFrac1000 = 1000L,
        keepQuantile = Some((1, 10))) // triggers the scoring stage
      bySplit.values.foreach(_.unpersist())
      val c = counts.toMap
      (0 until slots).map(i => c(s"score_sketch_$i"))
    }
    val skA = reportSketch(a)
    val skB = reportSketch(b)
    val skAll = reportSketch(rows)
    // total mass = scored docs; nothing silently dropped
    assert(skAll.sum == rows.size.toLong, s"$skAll")
    // field-wise sum of the shard reports == the full run's sketch (the
    // JSON-level rollup a dashboard does)
    assert(skA.zip(skB).map { case (x, y) => x + y } == skAll,
      s"$skA + $skB != $skAll")
    // and the round trip through the OPERATOR: the two report rows fed to
    // QuantileSketch.rollup reproduce the full sketch cell-for-cell
    val rolled = QuantileSketch.rollup(
        Seq(Tuple1(skA), Tuple1(skB)).toDF("sketch"),
        "sketch", PipelineCli.ScoreSketchBins, Nil)
      .select(col("sketch")).head.getSeq[Long](0)
    assert(rolled == skAll, s"$rolled != $skAll")
  }
}

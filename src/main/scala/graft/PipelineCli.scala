package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Layout
import graft.text.{Dedup, Pipeline, TextAnalysis}

/** End-to-end training-data pipeline orchestration — the LLM-side
  * counterpart of [[SlidingCli]] (the reference-side CLI): one main that
  * chains the cleaning stages a corpus actually goes through, from raw
  * parquet to sharded train/val/test output, and prints a one-line JSON
  * stage report (row counts per stage — the numbers a data-quality
  * dashboard tracks).
  *
  * Stages (each one of this library's gate-verified operators):
  *   1. normalize (lowercase/strip/collapse)
  *   2. PII redaction
  *   3. quality floor (integer quality score >= minQuality)
  *   4. repetition ceiling (dup-bigram mass <= maxDupFrac)
  *  4b. OPTIONAL model-based scoring (hashed-linear classifier inference
  *      when a weights parquet is given — the fastText/CCNet shape; the
  *      heuristic quality score otherwise) feeding the next two stages
  *  4c. OPTIONAL fraction-budgeted quantile filter: keep docs at/above
  *      the num/den exact quantile of the stage-4b score — globally, or
  *      per group (e.g. per source/language) so verbose domains can't
  *      crowd out terse ones. The threshold is computed over the
  *      POST-floor population: "keep the top 3/10 of what survived".
  *   5. OPTIONAL eval-set decontamination (n-gram span overlap against a
  *      blocklist parquet — runs before dedup so contaminated docs can't
  *      become cluster representatives)
  *   6. near-dedup (MinHash/LSH → verify → CC); survivor = min-id cluster
  *      rep, or with `bestkeep` the BEST-scored member of each cluster
  *      (the stage-4b score — keep-the-best survivor policy)
  *   7. OPTIONAL exact-substring span dedup (Lee et al. keep-first:
  *      corpus-duplicated n-gram spans are REMOVED from the surviving
  *      reps' text — near-dedup drops whole near-copies, this edits out
  *      the duplicated boilerplate near-dedup's doc-level Jaccard can't
  *      see; docs left empty by the rewrite are dropped)
  *   8. deterministic content-hash split (train/val/test)
  *   9. range-sorted capped shards per split
  *  10. OPTIONAL deterministic training order for the train split
  *      (source-balanced `interleaveBySource` when the input has a
  *      `source` column, hash-shuffle `trainingOrder` otherwise); the
  *      train shards then range-sort on the epoch position
  *
  * Usage:
  *   runMain graft.PipelineCli <docsParquet> <outDir>
  *     [minQuality] [maxDupFrac1000] [maxRecordsPerShard]
  *     [blocklistParquet|-] [ordered|-] [spanDedupN|-]
  *     [weightsParquet[@dim]|-] [num/den[@groupCol]|-] [bestkeep|-]
  *
  * Pass `-` in any optional slot to skip that stage so later positional
  * args stay reachable. spanDedupN enables stage 7 with that gram size
  * (≥ 2). The weights parquet is (bucket BIGINT, w_permille BIGINT) —
  * a trained linear classifier exported as a table (default dim 4096).
  * `num/den` enables the quantile filter (e.g. 7/10 keeps the top 3/10
  * by score); `@groupCol` makes it per-group (the column must exist on
  * the input docs). `bestkeep` switches near-dedup's survivor policy to
  * keep-the-best-scored.
  */
object PipelineCli {

  /** Declared domain of the stage report's score-distribution sketch
    * (`score_sketch_<slot>` entries): FIXED slots are what make shard
    * reports align, so rolling reports up across shards/runs is a plain
    * field-wise sum — exactly [[graft.operators.QuantileSketch.merge]]'s
    * vector-add monoid, spec-gated round-trip. [-1000, 1000) × 20 bins
    * (width 100) covers the heuristic quality score (0..~1000) and the
    * classifier's logit_permille around 0; anything outside lands in the
    * sketch's own under/overflow slots, never dropped. */
  private[graft] val ScoreSketchLo = -1000L
  private[graft] val ScoreSketchHi = 1000L
  private[graft] val ScoreSketchBins = 20

  /** The pipeline as a library call — returns (splitName -> cleaned docs)
    * plus the per-stage counts. Deterministic end to end: re-running on
    * the same corpus yields byte-identical shards.
    *
    * Stage outputs are persisted while they still feed later stages, and
    * unpersisted the moment their last consumer has materialized —
    * without this, `redacted` re-executes normalize+redact under each
    * filter scan AND the join, and `filtered` re-executes the whole chain
    * under nearDedup and again under every split join (~4 full corpus
    * passes where 1–2 suffice; at 100 TB that is the pipeline's cost).
    * The RETURNED split frames are each persisted and already
    * materialized (their counts are the stage report), so writing them
    * out touches no upstream lineage; callers unpersist them via
    * `df.unpersist()` when done (the CLI holds them only until its
    * shard writes finish).
    *
    * The library operators each end with an oracle-determinism `orderBy`;
    * composed here those sorts do NO work — Catalyst's EliminateSorts
    * removes a Sort under a join/aggregation that cannot observe it
    * (verified: the composed physical plan has zero Sort nodes and zero
    * range exchanges before the shard writer's own range partitioning). */
  def run(docs: DataFrame, minQuality: Long, maxDupFrac1000: Long,
          evalBlocklist: Option[DataFrame] = None, decontamN: Int = 8,
          orderTrain: Boolean = false, spanDedupN: Option[Int] = None,
          classifierWeights: Option[DataFrame] = None, classifierDim: Int = 4096,
          keepQuantile: Option[(Int, Int)] = None,
          quantileGroupCol: Option[String] = None,
          survivorPolicy: Boolean = false)
      : (Map[String, DataFrame], Seq[(String, Long)]) = {
    quantileGroupCol.foreach(g => require(docs.columns.contains(g),
      s"quantile group column '$g' not found on the input docs"))
    require(quantileGroupCol.isEmpty || keepQuantile.isDefined,
      "a quantile group column needs a num/den quantile to apply")
    // every stage cache is tracked so a mid-pipeline failure (e.g. inside
    // nearDedup) can't leak persisted frames into the shared session —
    // without the finally, a crashed run pins the corpus in executor
    // memory until the session dies
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def pin(df: DataFrame): DataFrame = { pinned += df.persist(); df }
    // Checkpoints.scoped: nearDedup's internal checkpoints (signature/
    // bucket tables) are consumed by the time the split counts materialize
    // — or abandoned on failure; either way their blocks are dead weight
    // in a long session, so free them deterministically on the way out
    graft.operators.Checkpoints.scoped {
      try {
        val out = runStages(docs, minQuality, maxDupFrac1000, evalBlocklist, decontamN,
          orderTrain, spanDedupN, classifierWeights, classifierDim,
          keepQuantile, quantileGroupCol, survivorPolicy, pin)
        pinned.clear() // success: stages already unpersisted what they owned
        out
      } finally pinned.foreach(_.unpersist(blocking = false))
    }
  }

  private def runStages(docs: DataFrame, minQuality: Long, maxDupFrac1000: Long,
                        evalBlocklist: Option[DataFrame], decontamN: Int,
                        orderTrain: Boolean, spanDedupN: Option[Int],
                        classifierWeights: Option[DataFrame], classifierDim: Int,
                        keepQuantile: Option[(Int, Int)],
                        quantileGroupCol: Option[String],
                        survivorPolicy: Boolean,
                        pin: DataFrame => DataFrame)
      : (Map[String, DataFrame], Seq[(String, Long)]) = {
    val counts = Seq.newBuilder[(String, Long)]
    // stage 0: input-contract expectations (the dbt-test / Great-
    // Expectations gate, [[graft.operators.Quality.expectations]]): ONE
    // shared aggregation reports NULL ids, NULL text and duplicate ids
    // BEFORE anything downstream trusts the extract; the report rides
    // into the stage-count JSON as expect_<rule>_<col> entries, and its
    // n_rows doubles as the input count (no extra scan).
    import graft.operators.Quality
    val expReport = Quality.expectations(docs.select("doc_id", "text"), Seq(
      Quality.ExpectNotNull("doc_id"), Quality.ExpectNotNull("text"),
      Quality.ExpectUnique("doc_id"))).collect()
    counts += "input" -> expReport.head.getAs[Long]("n_rows")
    expReport.foreach { r =>
      counts += s"expect_${r.getAs[String]("rule")}_${r.getAs[String]("col_name")}" ->
        r.getAs[Long]("n_violations")
    }
    // contract ENFORCEMENT, branched on the (already-collected) report so
    // clean corpora pay nothing: NULL ids/text carry no training signal
    // and break the doc_id-join discipline — dropped; duplicated ids
    // would ROW-MULTIPLY every later doc_id join (scores, groups, splits)
    // — collapsed to one deterministic survivor (smallest remaining
    // columns, a doc_id-partitioned window, never partitionless)
    def viol(rule: String) = expReport
      .filter(_.getAs[String]("rule") == rule).map(_.getAs[Long]("n_violations")).sum
    val nonNull = if (viol("not_null") == 0L) docs
      else docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
    val input = if (viol("unique") == 0L) nonNull else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
        .orderBy(docs.columns.filterNot(_ == "doc_id").map(col).toIndexedSeq: _*)
      nonNull.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

    // redaction MUST see the RAW text: normalize strips exactly the
    // characters the email/phone patterns need ('@', '.', '-'), so the
    // reverse order silently ships PII into the shards (spec-gated now).
    // The placeholders then normalize to plain 'email'/'phone' tokens.
    val redactedRaw = Pipeline.redactPii(input)
      .select(col("doc_id"), col("red_text").as("text"))
    val redacted = pin(Pipeline.normalize(redactedRaw)
      .select(col("doc_id"), col("norm_text").as("text"))) // feeds both filter scans and the filtered join

    val qualityDF = TextAnalysis.quality(redacted, stopwords = Seq("the", "a", "and", "of"))
    val quality = qualityDF
      .filter(col("quality") >= minQuality).select("doc_id")
    // docs with < 2 tokens have NO bigrams and are absent from
    // repetition()'s output — they trivially satisfy any ceiling, so the
    // keep-set must be "not rejected" (anti-join against the violators),
    // not "present and below" (an inner join would silently delete them)
    val highRep = TextAnalysis.repetition(redacted)
      .filter(col("dup_frac1000") > maxDupFrac1000).select("doc_id")
    val afterFilters = pin(redacted.join(quality, "doc_id")
      .join(highRep, Seq("doc_id"), "left_anti")) // feeds nearDedup's several passes and the dedup join
    counts += "after_quality_filters" -> afterFilters.count()

    // stage 4b: the score the quantile filter and the survivor policy
    // both read — a trained hashed-linear classifier when the model table
    // is present (scored on the text the shards will actually hold, i.e.
    // post-redact/normalize), the heuristic quality score otherwise.
    // Pinned and materialized WHILE redacted is still cached; without
    // that the whole redact+normalize chain re-executes under the scan
    val scores: Option[DataFrame] =
      if (classifierWeights.isEmpty && keepQuantile.isEmpty && !survivorPolicy) None
      else {
        val s = pin(classifierWeights match {
          case Some(w) =>
            TextAnalysis.scoreHashedLinear(redacted, w, classifierDim)
              .select(col("doc_id"), col("logit_permille").as("__score"))
          case None =>
            qualityDF.select(col("doc_id"), col("quality").as("__score"))
        })
        counts += "scored" -> s.count()
        // the score DISTRIBUTION rides the report next to the count:
        // one fixed-slot quantile sketch of the stage-4b scores (one
        // map-side-combined aggregation over the just-cached score
        // table; the collected row is bins+2 longs, O(1) driver state).
        // Reports from independent shards/runs roll up by field-wise
        // sum — the sketch's exact merge contract
        val skRow = graft.operators.QuantileSketch.sketch(
            s.select(col("__score").as("score")), Seq.empty,
            "score", ScoreSketchLo, ScoreSketchHi, ScoreSketchBins)
          .head.getSeq[Long](0)
        skRow.zipWithIndex.foreach { case (cnt, i) =>
          counts += s"score_sketch_$i" -> cnt
        }
        Some(s)
      }
    redacted.unpersist() // its last consumers (filtered, scores) just
    // materialized — free it BEFORE the memory-heaviest stage (nearDedup)

    // stage 4c: fraction-budgeted exact-quantile filter on the score —
    // the threshold is an order statistic of the POST-floor population
    // (global TeraSort threshold, or one per group so verbose domains
    // can't crowd out terse ones)
    val afterQuantile = keepQuantile match {
      case Some((num, den)) =>
        val scored = afterFilters.join(scores.get, "doc_id")
        val kept = quantileGroupCol match {
          case Some(g) => Pipeline.filterByQuantilePerGroup(
              scored.join(input.select(col("doc_id"), col(g)), "doc_id"),
              "__score", g, num, den)
          case None => Pipeline.filterByQuantile(scored, "__score", num, den)
        }
        val res = pin(kept.select("doc_id", "text"))
        counts += "after_quantile_filter" -> res.count()
        afterFilters.unpersist()
        res
      case None => afterFilters
    }

    // optional eval-set decontamination (span-level, decontaminateNgrams):
    // runs BEFORE dedup so contaminated docs can't become cluster
    // representatives. The blocklist goes through the SAME redact →
    // normalize transforms as the corpus — the n-gram match is exact
    // token equality, and eval text is matched as the corpus looks HERE
    val filtered = evalBlocklist match {
      case Some(bl) =>
        val blNorm = Pipeline.normalize(
            Pipeline.redactPii(bl).select(col("doc_id"), col("red_text").as("text")))
          .select(col("doc_id"), col("norm_text").as("text"))
        val kept = pin(Pipeline.decontaminateNgrams(afterQuantile, blNorm, decontamN))
        counts += "after_decontamination" -> kept.count()
        afterQuantile.unpersist()
        kept
      case None => afterQuantile
    }

    // stage 6: near-dedup. Default survivor = the cluster's min-id member
    // (doc_id == cluster, CC's label convention); with the survivor
    // policy it is the BEST-scored member (ties to the smallest id) —
    // bestPerCluster over the same (doc, cluster) assignment, so turning
    // the policy on changes WHICH near-copy survives, never how many
    val reps =
      if (survivorPolicy)
        Dedup.bestPerCluster(Dedup.nearDedup(filtered), scores.get, "__score")
          .select(col("rep_doc").as("doc_id"))
      else
        Dedup.nearDedup(filtered)
          .filter(col("doc_id") === col("cluster")).select("doc_id")
    val afterNearDedup = pin(filtered.join(reps, "doc_id"))
    counts += "after_near_dedup" -> afterNearDedup.count()
    filtered.unpersist() // last consumer (afterNearDedup) is materialized
    scores.foreach(_.unpersist(blocking = false)) // quantile + survivor
    // stages are done with the score table

    // OPTIONAL stage 7: exact-substring span dedup over the SURVIVORS —
    // running it after near-dedup means whole near-copies are already
    // gone, so what gets edited out here is cross-doc duplicated
    // boilerplate (quotes, templates) that doc-level Jaccard can't see.
    // Docs the rewrite leaves empty carry no training signal — dropped.
    val deduped = spanDedupN match {
      case Some(n) =>
        val rewritten = pin(Dedup.removeDuplicatedSpans(afterNearDedup, n)
          .filter(col("clean_text") =!= "")
          .select(col("doc_id"), col("clean_text").as("text")))
        counts += "after_span_dedup" -> rewritten.count()
        afterNearDedup.unpersist()
        rewritten
      case None => afterNearDedup
    } // feeds the split assignment and all three split joins

    val split = Pipeline.datasetSplit(deduped).select("doc_id", "split")
    val bySplit = Seq("train", "val", "test").map { name =>
      name -> pin(deduped.join(split.filter(col("split") === name), "doc_id")
        .select("doc_id", "text"))
    }.toMap
    bySplit.toSeq.sortBy(_._1).foreach { case (name, df) =>
      counts += s"split_$name" -> df.count() // also materializes the cache
    }
    deduped.unpersist() // the persisted split frames now hold the data

    // OPTIONAL stage 9: deterministic training order. Real training prep
    // does not end at an unordered shard set — the epoch order is part of
    // the artifact. Source-balanced interleave when the input carries a
    // `source` column (every prefix holds each source in proportion ±1);
    // plain hash-shuffle rank otherwise. The train frame gains a leading
    // `pos` column; shard writers range-sort on it.
    val withOrder = if (!orderTrain) bySplit else {
      val train = bySplit("train")
      val ids = train.select("doc_id")
      val (mode, order) =
        if (input.columns.contains("source"))
          "interleave" -> Pipeline.interleaveBySource(
              input.select(col("doc_id"), col("source")).join(ids, "doc_id"))
            .select("pos", "doc_id")
        else
          "shuffle" -> Pipeline.trainingOrder(ids)
            .select(col("rank").as("pos"), col("doc_id"))
      val ordered = pin(train.join(order, "doc_id")
        .select(col("pos"), col("doc_id"), col("text")))
      counts += s"train_ordered_$mode" -> ordered.count()
      train.unpersist(blocking = false)
      bySplit.updated("train", ordered)
    }
    (withOrder, counts.result())
  }

  /** Parsed CLI arguments; `-` in an optional slot means "skip that
    * stage" so later positional args stay reachable. */
  private[graft] case class Args(input: String, outDir: String, minQuality: Long,
      maxDupFrac: Long, maxPerShard: Long, blocklistPath: Option[String],
      orderTrain: Boolean, spanDedupN: Option[Int],
      weightsPath: Option[String] = None, weightsDim: Int = 4096,
      keepQuantile: Option[(Int, Int)] = None,
      quantileGroup: Option[String] = None, bestKeep: Boolean = false)

  private[graft] def parseArgs(args: Array[String]): Args = {
    require(args.length >= 2, "usage: PipelineCli <docsParquet> <outDir> " +
      "[minQuality] [maxDupFrac1000] [maxRecordsPerShard] [blocklistParquet|-]" +
      " [ordered|-] [spanDedupN|-] [weightsParquet[@dim]|-]" +
      " [num/den[@groupCol]|-] [bestkeep|-] ('-' skips a stage so later" +
      " positional args stay reachable)")
    val orderTrain = args.length > 6 && {
      require(args(6) == "ordered" || args(6) == "-",
        s"7th arg must be 'ordered' or '-', got '${args(6)}'")
      args(6) == "ordered"
    }
    val spanDedupN = if (args.length > 7 && args(7) != "-") {
      val n = args(7).toInt
      require(n >= 2, s"spanDedupN must be >= 2, got $n")
      Some(n)
    } else None
    val (weightsPath, weightsDim) =
      if (args.length > 8 && args(8) != "-") args(8).split("@") match {
        case Array(p)    => (Some(p), 4096)
        case Array(p, d) => (Some(p), d.toInt)
        case _ => throw new IllegalArgumentException(
          s"9th arg must be weightsParquet[@dim] or '-', got '${args(8)}'")
      } else (None, 4096)
    val (keepQuantile, quantileGroup) =
      if (args.length > 9 && args(9) != "-") {
        val (frac, group) = args(9).split("@") match {
          case Array(f)    => (f, None)
          case Array(f, g) => (f, Some(g))
          case _ => throw new IllegalArgumentException(
            s"10th arg must be num/den[@groupCol] or '-', got '${args(9)}'")
        }
        frac.split("/") match {
          case Array(n, d) => (Some((n.toInt, d.toInt)), group)
          case _ => throw new IllegalArgumentException(
            s"10th arg needs a num/den fraction, got '$frac'")
        }
      } else (None, None)
    val bestKeep = args.length > 10 && {
      require(args(10) == "bestkeep" || args(10) == "-",
        s"11th arg must be 'bestkeep' or '-', got '${args(10)}'")
      args(10) == "bestkeep"
    }
    Args(args(0), args(1),
      minQuality = if (args.length > 2) args(2).toLong else 400L,
      maxDupFrac = if (args.length > 3) args(3).toLong else 300L,
      maxPerShard = if (args.length > 4) args(4).toLong else 100000L,
      blocklistPath = if (args.length > 5) Some(args(5)).filter(_ != "-") else None,
      orderTrain = orderTrain, spanDedupN = spanDedupN,
      weightsPath = weightsPath, weightsDim = weightsDim,
      keepQuantile = keepQuantile, quantileGroup = quantileGroup,
      bestKeep = bestKeep)
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val Args(input, outDir, minQuality, maxDupFrac, maxPerShard,
      blocklistPath, orderTrain, spanDedupN, weightsPath, weightsDim,
      keepQuantile, quantileGroup, bestKeep) = a
    val spark = Sessions.tuned(SparkSession.builder()
        .appName("graft-pipeline")
        // same convention as SlidingCli: spark-submit overrides via
        // SPARK_MASTER / --master; bare runMain gets a local session
        .master(sys.env.getOrElse("SPARK_MASTER", "local[4]")),
        cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (bySplit, counts) = run(spark.read.parquet(input), minQuality, maxDupFrac,
      evalBlocklist = blocklistPath.map(spark.read.parquet),
      orderTrain = orderTrain, spanDedupN = spanDedupN,
      classifierWeights = weightsPath.map(spark.read.parquet),
      classifierDim = weightsDim, keepQuantile = keepQuantile,
      quantileGroupCol = quantileGroup, survivorPolicy = bestKeep)
    bySplit.foreach { case (name, df) =>
      val sortCol = if (orderTrain && name == "train") "pos" else "doc_id"
      Layout.saveShards(df, s"$outDir/$name", sortCol, maxPerShard)
      df.unpersist()
    }
    println(counts.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}

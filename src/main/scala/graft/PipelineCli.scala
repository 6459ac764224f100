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
  *   5. OPTIONAL eval-set decontamination (n-gram span overlap against a
  *      blocklist parquet — runs before dedup so contaminated docs can't
  *      become cluster representatives)
  *   6. near-dedup (MinHash/LSH → verify → CC; keep cluster reps)
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
  *     [blocklistParquet|-] [ordered|-] [spanDedupN]
  *
  * Pass `-` for the blocklist (skip decontamination) or for the ordered
  * slot (unordered) so later positional args stay reachable. spanDedupN
  * enables stage 7 with that gram size (≥ 2).
  */
object PipelineCli {

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
          orderTrain: Boolean = false, spanDedupN: Option[Int] = None)
      : (Map[String, DataFrame], Seq[(String, Long)]) = {
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
          orderTrain, spanDedupN, pin)
        pinned.clear() // success: stages already unpersisted what they owned
        out
      } finally pinned.foreach(_.unpersist(blocking = false))
    }
  }

  private def runStages(docs: DataFrame, minQuality: Long, maxDupFrac1000: Long,
                        evalBlocklist: Option[DataFrame], decontamN: Int,
                        orderTrain: Boolean, spanDedupN: Option[Int],
                        pin: DataFrame => DataFrame)
      : (Map[String, DataFrame], Seq[(String, Long)]) = {
    val counts = Seq.newBuilder[(String, Long)]
    counts += "input" -> docs.count()

    // redaction MUST see the RAW text: normalize strips exactly the
    // characters the email/phone patterns need ('@', '.', '-'), so the
    // reverse order silently ships PII into the shards (spec-gated now).
    // The placeholders then normalize to plain 'email'/'phone' tokens.
    val redactedRaw = Pipeline.redactPii(docs)
      .select(col("doc_id"), col("red_text").as("text"))
    val redacted = pin(Pipeline.normalize(redactedRaw)
      .select(col("doc_id"), col("norm_text").as("text"))) // feeds both filter scans and the filtered join

    val quality = TextAnalysis.quality(redacted, stopwords = Seq("the", "a", "and", "of"))
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
    redacted.unpersist() // its last consumer (filtered) just materialized —
    // free it BEFORE the memory-heaviest stage (nearDedup) runs

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
        val kept = pin(Pipeline.decontaminateNgrams(afterFilters, blNorm, decontamN))
        counts += "after_decontamination" -> kept.count()
        afterFilters.unpersist()
        kept
      case None => afterFilters
    }

    val reps = Dedup.nearDedup(filtered)
      .filter(col("doc_id") === col("cluster")).select("doc_id")
    val afterNearDedup = pin(filtered.join(reps, "doc_id"))
    counts += "after_near_dedup" -> afterNearDedup.count()
    filtered.unpersist() // last consumer (afterNearDedup) is materialized

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
        if (docs.columns.contains("source"))
          "interleave" -> Pipeline.interleaveBySource(
              docs.select(col("doc_id"), col("source")).join(ids, "doc_id"))
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

  /** Parsed CLI arguments; `-` in the blocklist or ordered slot means
    * "skip that stage" so later positional args stay reachable. */
  private[graft] case class Args(input: String, outDir: String, minQuality: Long,
      maxDupFrac: Long, maxPerShard: Long, blocklistPath: Option[String],
      orderTrain: Boolean, spanDedupN: Option[Int])

  private[graft] def parseArgs(args: Array[String]): Args = {
    require(args.length >= 2, "usage: PipelineCli <docsParquet> <outDir> " +
      "[minQuality] [maxDupFrac1000] [maxRecordsPerShard] [blocklistParquet|-]" +
      " [ordered|-] [spanDedupN] ('-' skips a stage so later positional args" +
      " stay reachable)")
    val orderTrain = args.length > 6 && {
      require(args(6) == "ordered" || args(6) == "-",
        s"7th arg must be 'ordered' or '-', got '${args(6)}'")
      args(6) == "ordered"
    }
    val spanDedupN = if (args.length > 7) {
      val n = args(7).toInt
      require(n >= 2, s"spanDedupN must be >= 2, got $n")
      Some(n)
    } else None
    Args(args(0), args(1),
      minQuality = if (args.length > 2) args(2).toLong else 400L,
      maxDupFrac = if (args.length > 3) args(3).toLong else 300L,
      maxPerShard = if (args.length > 4) args(4).toLong else 100000L,
      blocklistPath = if (args.length > 5) Some(args(5)).filter(_ != "-") else None,
      orderTrain = orderTrain, spanDedupN = spanDedupN)
  }

  def main(args: Array[String]): Unit = {
    val Args(input, outDir, minQuality, maxDupFrac, maxPerShard,
      blocklistPath, orderTrain, spanDedupN) = parseArgs(args)
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      // same convention as SlidingCli: spark-submit overrides via
      // SPARK_MASTER / --master; bare runMain gets a local session
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (bySplit, counts) = run(spark.read.parquet(input), minQuality, maxDupFrac,
      evalBlocklist = blocklistPath.map(spark.read.parquet),
      orderTrain = orderTrain, spanDedupN = spanDedupN)
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

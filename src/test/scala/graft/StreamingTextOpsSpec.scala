package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sampling
import graft.text.{Pipeline, TextAnalysis}

/** The narrow (shuffle-free) text-pipeline operators compose onto
  * Structured Streaming micro-batches UNCHANGED via `ordered = false` —
  * the same expressions that hash-match the batch oracles run per-batch
  * with no state store and exact batch parity. (The flag exists because
  * the analyzer's streaming support check runs BEFORE the optimizer: the
  * cosmetic trailing orderBy that EliminateSorts removes under batch
  * joins is a hard analysis error on a stream.) This is what makes the
  * cleaning pipeline deployable on a live ingest feed: redact /
  * normalize / quality / split / hash-sample are stateless per row, so
  * batch ≡ stream by construction — pinned down here. */
class StreamingTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "reach alice@example.com or 555-123-4567 now"),
    (3L, "THE THE THE the the spark row data batch"),
    (4L, "short"),
    (5L, "totally novel prose with many distinct tokens here"))

  private def runStream(f: DataFrame => DataFrame): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = f(stream.toDF().toDF("doc_id", "text"))
    val name = s"stream_text_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    stream.addData(rows.take(2))
    stream.addData(rows.drop(2)) // two micro-batches: append semantics per batch
    q.processAllAvailable(); q.stop()
    spark.table(name).collect().toSeq
  }

  private def parity(stage: DataFrame => DataFrame): Unit = {
    val streamed = runStream(stage).map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batch = stage(rows.toDF("doc_id", "text")).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.nonEmpty && streamed == batch.toSeq,
      s"stream/batch divergence:\n$streamed\nvs\n$batch")
  }

  test("redact -> normalize -> quality chain runs per-batch with exact batch parity") {
    def stage(df: DataFrame): DataFrame = {
      val redacted = Pipeline.redactPii(df, ordered = false)
        .select(col("doc_id"), col("red_text").as("text"))
      val normed = Pipeline.normalize(redacted, ordered = false)
        .select(col("doc_id"), col("norm_text").as("text"))
      TextAnalysis.quality(normed, stopwords = Seq("the", "a"), ordered = false)
        .select("doc_id", "n_tokens", "quality")
    }
    parity(stage)
    // and the PII actually crossed a micro-batch boundary redacted
    val texts = runStream(df => Pipeline.redactPii(df, ordered = false)
      .select(col("doc_id"), col("red_text")))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(2L).contains("<EMAIL>") && texts(2L).contains("<PHONE>"))
  }

  test("normalize -> split -> deterministic hash-sample chain streams with batch parity") {
    def stage(df: DataFrame): DataFrame = {
      val normed = Pipeline.normalize(df, ordered = false)
        .select(col("doc_id"), col("norm_text").as("text"))
      val split = Pipeline.datasetSplit(normed, ordered = false)
        .select(col("doc_id"), col("split"))
      Sampling.byKeyHash(split, Seq("doc_id"), 1, 2) // pure filter: streams as-is
    }
    parity(stage)
  }
}

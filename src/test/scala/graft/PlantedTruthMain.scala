package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-truth correctness check for the two quadratic-oracle gates
  * (q38_dedup_clusters, q56_chargram_jaccard) at sf0.1 SCALE — closing
  * the standing sweep skip ("quadratic DuckDB oracles, hours at sf0.1")
  * with a certificate instead of a policy note.
  *
  * Construction (the validated cipher synth of [[Sf1SynthMain]]): 10
  * Caesar-rotated copies of the sf0.01 corpus (500 docs), distinct
  * doc_ids per copy. A per-copy alphabet bijection leaves every
  * within-copy set relation exactly invariant — word sets for q38's
  * edges, char trigram sets for q56 — while cross-copy similarity stays
  * far below both gates' thresholds. Therefore the TRUE output on the
  * 5,000-doc corpus (the size of sf0.1) is exactly the union over
  * copies of the sf0.01 output with ids shifted by the copy offset:
  *   q38: cluster = min reachable id shifts with its copy;
  *   q56: (doc_a, doc_b) shift, inter/union counts are invariant.
  * The sf0.01 anchor outputs are hash-verified against the quadratic
  * DuckDB oracle by the standing correctness gate, so this check chains
  * oracle-grade truth up one decade without ever running the quadratic
  * oracle at sf0.1. Any cross-copy edge/pair the construction argument
  * missed would make the cell-exact comparison FAIL — the check does
  * not assume the argument, it tests it.
  *
  * Usage: Test/runMain graft.PlantedTruthMain [baseSfDir] [copies]
  * Prints one PASS/FAIL line per gate with row counts and timings.
  */
object PlantedTruthMain {

  private val Offset = 100000L

  /** Cipher 10× synth (Sf1SynthMain's default mode, parameterized base). */
  private[graft] def cipherCopies(docs: DataFrame, copies: Int): DataFrame = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (0 until copies).map { k =>
      docs.select(
        (col("doc_id") + lit(k * Offset)).as("doc_id"),
        translate(col("text"), alpha, alpha.drop(k) + alpha.take(k)).as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
    }.reduce(_.unionAll(_))
  }

  /** The base-gate rows with every id column shifted per copy — the
    * planted truth the synth-corpus gate run must reproduce. */
  private[graft] def shiftedUnion(base: Seq[Seq[Any]], idCols: Seq[Int],
                                  copies: Int): Set[Seq[Any]] =
    (0 until copies).flatMap { k =>
      base.map(row => row.zipWithIndex.map { case (v, i) =>
        if (idCols.contains(i)) v.asInstanceOf[Long] + k * Offset else v
      })
    }.toSet

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    // the cipher is only a bijection on THIS alphabet — verify, don't assume
    val offAlpha = docs.filter(!col("text").rlike("^[a-z ]*$")).count()
    require(offAlpha == 0, s"$offAlpha docs outside the a-z+space alphabet")
    require(docs.agg(max("doc_id")).head().getLong(0) < Offset,
      "doc ids overlap the copy offset")

    val synthDir = java.nio.file.Files.createTempDirectory("planted").toString
    cipherCopies(docs, copies).write.mode("overwrite")
      .parquet(s"$synthDir/documents.parquet")

    val gates = Seq(
      // (gate, id column positions in the output row)
      "q38_dedup_clusters" -> Seq(0, 1),
      "q56_chargram_jaccard" -> Seq(0, 1))
    var failed = false
    for ((gate, idCols) <- gates) {
      val q = SparkEntry.queries(gate)
      val base = q(spark, baseDir).collect().map(_.toSeq).toSeq
      val want = shiftedUnion(base, idCols, copies)
      val t0 = System.nanoTime()
      val got = q(spark, synthDir).collect().map(_.toSeq).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = got == want
      if (!ok) failed = true
      println(f"$gate: ${if (ok) "PASS" else "FAIL"} — base=${base.size} " +
        f"rows, planted=${want.size}, got=${got.size}, " +
        f"synth-run ${sec}%.2f s" + (if (ok) "" else
          s" | missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}"))
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}

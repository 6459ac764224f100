package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the sf1-scale PERFORMANCE-PROBE documents table (10× sf0.1) for
  * the PLANS.md second-decade scaling runs — a perf fixture, not an
  * oracle input. Each copy k gets distinct doc_ids (+k·100000) and one
  * copy-specific extra token, so cross-copy pairs fall BELOW the
  * similarity thresholds (the ~31-word docs top out at J = n/(n+2) ≈
  * 0.94 < 19/20 across copies) while each copy keeps the original
  * near-dup structure — edge density grows ~linearly with the data,
  * as real 10× corpus growth would, instead of quadratically as naive
  * duplication would.
  *
  * Usage: Test/runMain graft.Sf1SynthMain [outDir]
  */
object Sf1SynthMain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/sf1synth")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // two constructions, picked by args(1):
    //  - "marker" appends one copy token per doc (keeps the original
    //    vocabulary; the copy token is the corpus' rarest word, which
    //    floods prefix-indexed joins — a worst-case probe)
    //  - "remap" suffixes EVERY word with the copy id: disjoint WORD
    //    vocabularies per copy (but char-grams still overlap)
    //  - "cipher" (default) Caesar-rotates the letters per copy: both the
    //    word vocabulary AND the char-gram space are disjoint across
    //    copies while every within-copy set relation is preserved exactly
    //    (bijections leave Jaccard/containment invariant), so word-set
    //    and char-gram outputs are both exactly 10x sf0.1 — organic
    //    10x growth for every similarity gate. (The corpus alphabet is
    //    lowercase a-z + space, verified.)
    val mode = if (args.length > 1) args(1) else "cipher"
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // "remap100": the THIRD-decade corpus — 100 copies under the remap
    // construction (word-suffix per copy ⇒ disjoint word vocabularies for
    // any copy count, unlike the 26-rotation-bounded cipher), so all
    // word-level dup/hygiene structure replicates exactly 100×
    val nCopies = if (mode == "remap100") 100 else 10
    val copies = (0 until nCopies).map { k =>
      val text = mode match {
        case "marker" => concat(col("text"), lit(s" copytok$k"))
        case "remap" | "remap100" => array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"x$k"))), " ")
        case _ => translate(col("text"), alpha, alpha.drop(k) + alpha.take(k))
      }
      docs.select(
        (col("doc_id") + lit(k.toLong * 100000L)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"))
        // recompute instead of adjusting: each mode changes text length
        // differently (cipher: unchanged, remap: +2/word, marker: +9)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    copies.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"WROTE $out/documents.parquet rows=" +
      spark.read.parquet(s"$out/documents.parquet").count())
    if (mode == "tables") writeTables(spark, out)
    spark.stop()
  }

  /** 10× FACT tables for the analytics/events gates, dims shared — the
    * realistic decade: orders/lineitem/events grow, customer/supplier/
    * part/nation/region do not (each customer simply has 10× orders).
    * Keys offset per copy (order/event ids disjoint); event timestamps
    * shift by a ~115-day epoch per copy so session/as-of/range-join
    * structure replicates exactly (10× sessions, never cross-copy
    * matches). Dim keys untouched, so every join fans out 10×. */
  private def writeTables(spark: SparkSession, out: String): Unit = {
    val base = "/root/testdata/sf0.1"
    val KEY = 1000000000L // > any base key
    val EPOCH_NS = 10000000000000000L // ~115 days in ns
    def tenWith(name: String)(f: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame): Unit = {
      val src = spark.read.parquet(s"$base/$name.parquet")
      (0 until 10).map(k => f(src, k)).reduce(_.unionByName(_))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"WROTE $out/$name.parquet rows=" +
        spark.read.parquet(s"$out/$name.parquet").count())
    }
    tenWith("orders") { (df, k) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(k * KEY))
    }
    tenWith("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * KEY))
    }
    // events.parquet carries TIMESTAMP(NANOS); read as Long ns (the same
    // convention every gate session uses) and write BIGINT ns — gates see
    // the identical runtime Long either way
    val ev = spark.read
      .option("mergeSchema", "false")
      .parquet(s"$base/events.parquet")
    (0 until 10).map { k =>
      ev.withColumn("event_id", col("event_id") + lit(k * KEY))
        .withColumn("ts", col("ts") + lit(k * EPOCH_NS))
    }.reduce(_.unionByName(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"WROTE $out/events.parquet rows=" +
      spark.read.parquet(s"$out/events.parquet").count())
    for (dim <- Seq("customer", "supplier", "part", "nation", "region")) {
      spark.read.parquet(s"$base/$dim.parquet")
        .write.mode("overwrite").parquet(s"$out/$dim.parquet")
      println(s"WROTE $out/$dim.parquet (verbatim dim)")
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the sf1-scale ORACLE-EXPOSURE table set (10× sf0.1) for the
  * r13 verdict's #2: the heavyweight graph/dedup gates
  * (q111/q123/q126/q153/q155/q90/q91) have only ever been
  * DuckDB-checked up to sf0.1 — this main synthesizes a deterministic
  * sf1 directory they can run through `graft.Verify` + the oracle
  * checker unchanged. Unlike the perf fixtures (Ev10xSynthMain), every
  * construction here is ORGANIC for the structures those gates compute,
  * so the outputs grow the way real 10× data would:
  *
  *  - `lineitem`: 10 copies with DISJOINT (l_orderkey, l_partkey,
  *    l_suppkey) key spaces (+k·10M each; sf0.1 keys < 150k) — the
  *    part↔supplier bipartite graph (q111/q153/q155) and the
  *    co-purchase basket graph (q123/q126) each become 10 disjoint
  *    copies: 10× nodes, 10× edges, per-copy structure intact.
  *  - `supplier`: 10 copies, s_suppkey + k·10M, attributes unchanged —
  *    the q153/q155 seed predicates (s_nationkey = 1,
  *    s_suppkey % 100 = 1: 10M ≡ 0 (mod 100)) select each copy's seeds
  *    exactly as they select the original's.
  *  - `documents`: the Sf1SynthMain cipher construction (doc_id +
  *    k·100000, per-copy Caesar rotation — bijections preserve every
  *    within-copy set relation exactly while word AND char-gram
  *    vocabularies stay disjoint across copies), so q90's near-dup
  *    clusters replicate 10×.
  *  - `embeddings`: 10 copies, vec_id + k·1M, copy k's vectors
  *    SIGN-FLIPPED per dimension by a seeded ±1 pattern — cosine is
  *    invariant under a shared sign pattern (s²=1), so within-copy
  *    similarity structure is EXACT, while cross-copy cosines are
  *    decorrelated (expected 0). q91 and its oracle replay the same
  *    LSH + verify arithmetic either way, so the few cross-copy pairs
  *    that land above threshold are legitimate data, not drift.
  *
  * Usage: Test/runMain graft.Sf1FullSynthMain [outDir]
  */
object Sf1FullSynthMain {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/target/sf1full")
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val nCopies = 10

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until nCopies).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 10000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k.toLong * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _).repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val sup = spark.read.parquet(s"$src/supplier.parquet")
    (0 until nCopies).map { k =>
      sup.withColumn("s_suppkey", col("s_suppkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _).repartition(8)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    (0 until nCopies).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k.toLong * 100000L))
        .withColumn("text",
          translate(col("text"), alpha, alpha.drop(k) + alpha.take(k)))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ union _).repartition(16)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until nCopies).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k.toLong * 1000000L))
        .withColumn("embedding", expr(
          s"""transform(embedding, (e, d) ->
             |  CASE WHEN pmod(xxhash64(d, ${k}L), 2) = 0 THEN e
             |       ELSE -e END)""".stripMargin)
          .cast("array<float>"))
    }.reduce(_ union _).repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // orders expanded with DISJOINT key spaces (r14 continuation): the
    // q231/q234 incremental-CC fixture derives its star-of-stars graph
    // from o_orderkey, so disjoint +k·10M copies grow the component
    // structure organically (10× components, per-copy shape intact) —
    // max key 96M stays far below the q231 fresh-node offset (1e9).
    // Nothing in the earlier sf1 verdicts (q111 family) reads orders.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    (0 until nCopies).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 10000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(k.toLong * 10000000L))
    }.reduce(_ union _).repartition(16)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // the remaining catalog tables are read by SOME gates' verify runs
    // only for schema/lookups — pass them through so any gate can run
    for (t <- Seq("region", "nation", "customer", "part", "events"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    println(s"SF1FULL done at $out: " +
      s"lineitem=${spark.read.parquet(s"$out/lineitem.parquet").count()} " +
      s"documents=${spark.read.parquet(s"$out/documents.parquet").count()} " +
      s"embeddings=${spark.read.parquet(s"$out/embeddings.parquet").count()}")
    spark.stop()
  }
}

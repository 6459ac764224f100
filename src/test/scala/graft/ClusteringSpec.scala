package graft

import org.apache.spark.sql.functions._

import graft.embed.Clustering

/** Integer-exact k-means and SemDeDup contracts: planted well-separated
  * clusters are recovered exactly, assignments are deterministic across
  * partitionings (the hash-gate precondition), empty-cluster and
  * domain-guard behavior, and semDedup's within-cluster near-dup
  * marking (earliest id wins; cross-cluster pairs out of scope by
  * design). The exact replay itself is oracle-gated (q232/q233). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  /** Planted fixture: `k` well-separated centers on coordinate axes,
    * tight noise — every Lloyd variant must recover the planting. */
  private def planted(k: Int, per: Int, dim: Int = 8): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7)
    (0 until k).flatMap { c =>
      (0 until per).map { i =>
        val id = (c * per + i).toLong
        val v = (0 until dim).map(d =>
          (if (d == c) 0.8f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.05f)
        id -> v
      }
    }
  }

  test("planted clusters recovered exactly; assignment agrees with planting") {
    val rows = planted(k = 4, per = 25)
    val df = rows.toDF("vec_id", "embedding")
    // one explicit seed per planted blob: with well-separated blobs this
    // must recover the planting exactly (Lloyd from a good init)
    val got = Clustering.kmeans(df, "vec_id", "embedding", k = 4, rounds = 3,
        seedIds = Some(Seq(0L, 25L, 50L, 75L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same planted center => same cluster label; different => different
    val byPlant = rows.groupBy(_._1 / 25).map { case (p, xs) =>
      p -> xs.map(x => got(x._1)).distinct
    }
    byPlant.foreach { case (p, labels) =>
      assert(labels.size == 1, s"planted center $p split: $labels")
    }
    assert(byPlant.values.flatten.toSeq.distinct.size == 4)
  }

  test("deterministic across partitionings (the hash-gate precondition)") {
    val df = planted(3, 20).toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Clustering.kmeans(d, "vec_id", "embedding", k = 3, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(df) == run(df.repartition(17)))
  }

  test("labels are seed ids; d2 is the exact integer distance to the winning centroid") {
    val rows = Seq(
      1L -> Seq(0.5f, 0.5f), 2L -> Seq(0.5f, 0.5f), 3L -> Seq(-0.5f, -0.5f))
    val out = Clustering.kmeans(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, rounds = 2).collect()
    val labels = out.map(_.getLong(1)).toSet
    assert(labels.subsetOf(Set(1L, 2L, 3L)))
    // ids 1,2 coincide: one of them must be distance 0 from its centroid
    assert(out.filter(r => Set(1L, 2L)(r.getLong(0))).forall(_.getLong(2) == 0L))
  }

  test("rounds=1 is pure seed assignment; k > n degrades to n seeds") {
    val rows = Seq(10L -> Seq(0.1f, 0.0f), 20L -> Seq(-0.1f, 0.0f))
    val out = Clustering.kmeans(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 5, rounds = 1).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 20L))
    // each point is its own seed => distance 0
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("out-of-domain embedding values RAISE") {
    val rows = Seq(1L -> Seq(2.5f, 0.0f))
    val e = intercept[Exception] {
      Clustering.kmeans(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, rounds = 1).collect()
    }
    assert(e.getMessage.contains("quantization domain"))
  }

  test("serve: kmeansAssign(kmeansCentroids(df), df) == kmeans(df); guards raise") {
    val df = planted(3, 20).toDF("vec_id", "embedding")
    val trained = Clustering.kmeans(df, "vec_id", "embedding", k = 3, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val cents = Clustering.kmeansCentroids(df, "vec_id", "embedding",
      k = 3, rounds = 3)
    val served = Clustering.kmeansAssign(cents, df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served == trained)
    // duplicate cluster id in the stored model RAISES
    val dup = cents.union(cents)
    val e1 = intercept[Exception] {
      Clustering.kmeansAssign(dup, df, "vec_id", "embedding").collect()
    }
    assert(e1.getMessage.contains("duplicate cluster"))
    // mixed dimensionality RAISES
    import org.apache.spark.sql.functions.{col, slice}
    val ragged = cents.limit(1).select(col("cluster"), slice(col("r"), 1, 3).as("r"))
      .union(cents.orderBy(col("cluster").desc).limit(1))
    val e2 = intercept[Exception] {
      Clustering.kmeansAssign(ragged, df, "vec_id", "embedding").collect()
    }
    assert(e2.getMessage.contains("dimensionality"))
  }

  test("semDedupDelta: corpus hits and earlier-delta hits, min id wins; delta-only universe; overlap raises") {
    import org.apache.spark.sql.functions.col
    // two far-apart corpus vectors; delta has two dups of corpus id 1,
    // one unique vector near corpus id 2's blob, one fully novel
    val corpusRows = Seq(1L -> Seq(0.5f, 0.0f, 0.0f), 2L -> Seq(0.0f, 0.5f, 0.0f))
    val corpusDf = corpusRows.toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(corpusDf, "vec_id", "embedding",
      k = 2, rounds = 2)
    val corpus = corpusDf.join(
      Clustering.kmeansAssign(cents, corpusDf, "vec_id", "embedding")
        .select(col("vec_id"), col("cluster")), "vec_id")
    val delta = Seq(
      10L -> Seq(0.5f, 0.0f, 0.0f),  // dup of corpus 1
      11L -> Seq(0.5f, 0.0f, 0.0f),  // dup of 1 AND 10 — min wins: 1
      12L -> Seq(0.0f, 0.0f, 0.5f)   // novel direction, no dup
    ).toDF("vec_id", "embedding")
    val out = Clustering.semDedupDelta(corpus, delta, cents,
        "vec_id", "embedding", minScore1e6 = 999000L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // delta-only universe
    assert(out(10L).contains(1L))
    assert(out(11L).contains(1L))
    assert(out(12L).isEmpty)
    // overlapping ids RAISE
    val e = intercept[IllegalArgumentException] {
      Clustering.semDedupDelta(corpus,
        Seq(1L -> Seq(0.5f, 0.0f, 0.0f)).toDF("vec_id", "embedding"),
        cents, "vec_id", "embedding", 999000L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("the assign stage is NARROW: no Window, no join, no exchange beyond the output sort (r15 verdict)") {
    val df = planted(3, 20).toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(df, "vec_id", "embedding",
      k = 3, rounds = 2)
    val plan = Clustering.kmeansAssign(cents, df, "vec_id", "embedding")
      .queryExecution.executedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"assign stage planned a Window:\n$plan")
    assert(!plan.toString.contains("Join"), s"assign stage planned a join:\n$plan")
    // the ONLY exchange is the presentation orderBy's range partitioning —
    // scoring itself is one map pass over the scan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.forall(_.outputPartitioning.toString.contains("range")),
      s"assign stage shuffled beyond the output sort:\n$plan")
  }

  test("semDedup: exact dups within a cluster marked with the earliest id; kept rows NULL") {
    // two identical triples + a singleton, far apart
    val rows = Seq(
      1L -> Seq(0.5f, 0.0f, 0.0f), 2L -> Seq(0.5f, 0.0f, 0.0f),
      3L -> Seq(0.5f, 0.0f, 0.0f), 9L -> Seq(0.0f, 0.5f, 0.0f))
    val out = Clustering.semDedup(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, rounds = 3, minScore1e6 = 999000L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(1L) && out(3L).contains(1L))
    assert(out(9L).isEmpty)
  }
}

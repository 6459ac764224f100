package graft

import org.apache.spark.sql.functions._

import graft.text.{Dedup, Pipeline}

/** Survivor-policy exact dedup (q85) and exact-quantile filtering (q86):
  * argmax semantics, NULL-score degrades, hashed-key parity, and
  * brute-force threshold parity under repartitioning. */
class SurvivorQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String, java.lang.Long)*) =
    rows.toDF("doc_id", "text", "n_chars")

  test("exactBest keeps the highest-scored member, ties to the smallest doc_id") {
    val out = Dedup.exactBest(docsDF(
        (1L, "a b c", 10L), (2L, "c b a", 50L), (3L, "b a c", 50L), // dup group
        (4L, "x y", 7L)), "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // group {1,2,3}: best score 50 shared by 2 and 3 -> doc 2 survives
    assert(out == Seq((2L, 50L, 3L), (4L, 7L, 1L)))
  }

  test("NULL score loses to any scored member; all-NULL group keeps min doc_id, NULL best") {
    val out = Dedup.exactBest(docsDF(
        (1L, "a b", null), (2L, "b a", 3L),   // scored member wins
        (5L, "q r", null), (6L, "r q", null)), // all-NULL group
        "n_chars")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSeq
    assert(out == Seq((2L, Some(3L), 2L), (5L, None, 2L)))
  }

  test("hashed-key path is row-identical to the byte-exact path") {
    val rnd = new scala.util.Random(85)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val rows = (1L to 300L).map { i =>
      val text = Seq.fill(3 + rnd.nextInt(4))(words(rnd.nextInt(words.size))).mkString(" ")
      (i, text, java.lang.Long.valueOf(rnd.nextInt(100).toLong))
    }
    val exact = Dedup.exactBest(docsDF(rows: _*), "n_chars", verifyExact = true).collect().toSeq
    val hashed = Dedup.exactBest(docsDF(rows: _*), "n_chars", verifyExact = false).collect().toSeq
    assert(exact == hashed)
  }

  test("exactBest groups exactly as exact(): same dup_cnt multiset, same group count") {
    val rnd = new scala.util.Random(851)
    val rows = (1L to 200L).map { i =>
      (i, s"w${rnd.nextInt(30)} w${rnd.nextInt(30)}", java.lang.Long.valueOf(i % 17))
    }
    val best = Dedup.exactBest(docsDF(rows: _*), "n_chars").collect()
    val plain = Dedup.exact(docsDF(rows: _*).select("doc_id", "text")).collect()
    assert(best.length == plain.length)
    assert(best.map(_.getLong(2)).sorted.toSeq == plain.map(_.getLong(1)).sorted.toSeq)
  }

  test("bestPerCluster: planted near-dup cluster keeps its best-scored member, singletons keep themselves") {
    // docs 1-3 share all but one token -> one LSH cluster; doc 9 is alone
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val out = graft.text.Dedup.nearDedupBest(docsDF(
        (1L, base + " xa", 10L), (2L, base + " xb", 99L), (3L, base + " xc", 50L),
        (9L, "completely different words here entirely", 7L)), "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, 2L, 99L, 3L), (9L, 9L, 7L, 1L)))
  }

  test("bestPerCluster over an exact-group assignment agrees with exactBest") {
    val rnd = new scala.util.Random(852)
    val rows = (1L to 150L).map { i =>
      (i, s"w${rnd.nextInt(20)} w${rnd.nextInt(20)}", java.lang.Long.valueOf(rnd.nextInt(40).toLong))
    }
    val docs = docsDF(rows: _*)
    // exact groups as a (doc_id, cluster) assignment: cluster = group min id
    val fp = docs.select(col("doc_id"),
      array_join(array_sort(array_distinct(split(col("text"), " "))), " ").as("fp"))
    val assign = fp.join(
      fp.groupBy("fp").agg(min("doc_id").as("cluster")), "fp")
      .select("doc_id", "cluster")
    val viaCluster = graft.text.Dedup.bestPerCluster(assign, docs, "n_chars")
      .select("rep_doc", "best_score", "cluster_size")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val viaExact = graft.text.Dedup.exactBest(docs, "n_chars")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(viaCluster.toSeq == viaExact.toSeq)
  }

  test("bestPerCluster: members missing from the scored frame lose; all-unscored clusters degrade") {
    val assign = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")
    val scored = docsDF((2L, "t", 3L)) // only doc 2 has a score
    val out = graft.text.Dedup.bestPerCluster(assign, scored, "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getLong(3))).toSeq
    assert(out == Seq((1L, 2L, Some(3L), 2L), (5L, 5L, None, 2L)))
  }

  test("filterByQuantile matches the brute-force exact threshold across num/den and partitionings") {
    val rnd = new scala.util.Random(86)
    val rows = (1L to 500L).map(i =>
      (i, "t", java.lang.Long.valueOf(rnd.nextInt(50).toLong))) :+
      ((501L, "t", null: java.lang.Long))
    val scores = rows.flatMap(r => Option(r._3).map(_.toLong)).sorted
    for ((num, den) <- Seq((1, 2), (7, 10), (1, 10), (9, 10), (3, 4));
         parts <- Seq(1, 7)) {
      val thr = scores((num.toLong * scores.size / den).toInt)
      val got = Pipeline.filterByQuantile(
          docsDF(rows: _*).repartition(parts), "n_chars", num, den)
        .select("doc_id").as[Long].collect().toSet
      val want = rows.filter(r => Option(r._3).exists(_.toLong >= thr)).map(_._1).toSet
      assert(got == want, s"num=$num den=$den parts=$parts (thr=$thr)")
    }
  }

  test("filterByQuantile: empty and all-NULL inputs yield empty output without throwing") {
    val empty = docsDF()
    assert(Pipeline.filterByQuantile(empty, "n_chars", 1, 2).count() == 0L)
    val allNull = docsDF((1L, "a", null), (2L, "b", null))
    assert(Pipeline.filterByQuantile(allNull, "n_chars", 1, 2).count() == 0L)
  }

  test("filterByQuantilePerGroup matches a per-group brute force; NULL group is its own group") {
    val rnd = new scala.util.Random(87)
    val groups = Seq("web", "books", "code", null)
    val rows = (1L to 400L).map { i =>
      (i, groups(rnd.nextInt(groups.size)), java.lang.Long.valueOf(rnd.nextInt(60).toLong))
    }
    val df = rows.toDF("doc_id", "lang", "n_chars")
    for ((num, den) <- Seq((7, 10), (1, 2), (3, 4)); parts <- Seq(1, 5)) {
      val got = graft.text.Pipeline.filterByQuantilePerGroup(
          df.repartition(parts), "n_chars", "lang", num, den)
        .select("doc_id").as[Long].collect().toSet
      val want = rows.groupBy(_._2).toSeq.flatMap { case (_, members) =>
        val scores = members.map(_._3.toLong).sorted
        val thr = scores((num.toLong * scores.size / den).toInt)
        members.filter(_._3.toLong >= thr).map(_._1)
      }.toSet
      assert(got == want, s"num=$num den=$den parts=$parts")
    }
  }

  test("filterByQuantilePerGroup: all-NULL-score groups are dropped; single group agrees with filterByQuantile") {
    val mixed = Seq(
      (1L, "a", java.lang.Long.valueOf(5L)), (2L, "a", java.lang.Long.valueOf(9L)),
      (3L, "b", null: java.lang.Long), (4L, "b", null: java.lang.Long))
      .toDF("doc_id", "lang", "n_chars")
    val kept = graft.text.Pipeline
      .filterByQuantilePerGroup(mixed, "n_chars", "lang", 1, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L)) // group b vanishes; group a's median-rank value is 9

    val rnd = new scala.util.Random(871)
    val one = (1L to 200L).map(i =>
      (i, "only", java.lang.Long.valueOf(rnd.nextInt(40).toLong))).toDF("doc_id", "lang", "n_chars")
    val viaGroup = graft.text.Pipeline
      .filterByQuantilePerGroup(one, "n_chars", "lang", 7, 10)
      .select("doc_id").as[Long].collect().toSet
    val viaGlobal = graft.text.Pipeline.filterByQuantile(one, "n_chars", 7, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(viaGroup == viaGlobal)
  }

  test("filterByQuantile rejects degenerate num/den") {
    val d = docsDF((1L, "a", 1L))
    intercept[IllegalArgumentException](Pipeline.filterByQuantile(d, "n_chars", 0, 2))
    intercept[IllegalArgumentException](Pipeline.filterByQuantile(d, "n_chars", 2, 2))
    intercept[IllegalArgumentException](Pipeline.filterByQuantile(d, "n_chars", 1, 1))
  }
}

package graft

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 2000L).map(i => (i, (i % 7).toInt)).toDF("k", "sub")

  test("hash sample is deterministic and partition-count independent") {
    val a = Sampling.byKeyHash(rows, Seq("k"), 1, 2).collect().map(_.getLong(0)).sorted
    val b = Sampling.byKeyHash(rows.repartition(13), Seq("k"), 1, 2)
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b), "sample changed with partitioning")
    // a seeded .sample() does NOT have this property across repartitions —
    // that's exactly why this operator exists
  }

  test("sample and complement partition the input exactly") {
    val s = Sampling.byKeyHash(rows, Seq("k"), 3, 10).collect().map(_.getLong(0)).toSet
    val c = Sampling.byKeyHashComplement(rows, Seq("k"), 3, 10)
      .collect().map(_.getLong(0)).toSet
    assert((s & c).isEmpty && (s | c).size == 2000)
    // fraction lands near num/den (hash uniformity, not an exact count)
    assert(math.abs(s.size / 2000.0 - 0.3) < 0.05, s"fraction=${s.size / 2000.0}")
  }

  test("composite keys cannot alias: (1,23) != (12,3)") {
    val d1 = Seq(("1", "23"), ("12", "3")).toDF("a", "b")
    val kept = Sampling.byKeyHash(d1, Seq("a", "b"), 1, 2).count() +
      Sampling.byKeyHashComplement(d1, Seq("a", "b"), 1, 2).count()
    assert(kept == 2)
    // the separator makes the two concatenations distinct strings; with a
    // bare concat both rows would hash identically ("123")
    import org.apache.spark.sql.functions._
    val h = d1.select(graft.text.TextOps.xhash(concat_ws("\u0001", col("a"), col("b"))))
      .collect().map(_.getLong(0)).toSet
    assert(h.size == 2, "composite keys aliased to the same hash")
  }

  test("NULL key components do not alias: (NULL, '7') and ('7', NULL) sample independently") {
    val d = Seq((Some("7"), None: Option[String]), (None: Option[String], Some("7")))
      .toDF("a", "b")
    import org.apache.spark.sql.functions._
    // distinct hashes ⇒ independent decisions (concat_ws alone would have
    // collapsed both rows to the key "7")
    val hs = d.select(graft.text.TextOps.xhash(
        concat_ws("\u0001", coalesce(col("a"), lit("\u0002")), coalesce(col("b"), lit("\u0002")))))
      .collect().map(_.getLong(0)).toSet
    assert(hs.size == 2)
    // and the operator itself partitions the two rows exactly
    val kept = Sampling.byKeyHash(d, Seq("a", "b"), 1, 2).count() +
      Sampling.byKeyHashComplement(d, Seq("a", "b"), 1, 2).count()
    assert(kept == 2)
  }

  test("stratified sampling: per-stratum fractions, deterministic, default drops") {
    val d = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("k", "s")
    val out = Sampling.stratifiedByKeyHash(d, Seq("k"), "s",
      Map("a" -> (1, 4), "b" -> (3, 4)))
    val by = out.groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!by.contains("c"), "unlisted stratum must fall to the default (drop)")
    assert(math.abs(by("a") / 1000.0 - 0.25) < 0.06, s"a: ${by("a")}")
    assert(math.abs(by("b") / 1000.0 - 0.75) < 0.06, s"b: ${by("b")}")
    // deterministic under repartition (the property sampleBy lacks)
    val again = Sampling.stratifiedByKeyHash(d.repartition(7), Seq("k"), "s",
      Map("a" -> (1, 4), "b" -> (3, 4))).collect().map(_.getLong(0)).sorted
    assert(again.sameElements(out.collect().map(_.getLong(0)).sorted))
    // a stratum at 1/1 keeps everything; rejects bad fractions
    val full = Sampling.stratifiedByKeyHash(d, Seq("k"), "s", Map("c" -> (1, 1)))
    assert(full.count() == 1000)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedByKeyHash(d, Seq("k"), "s", Map("a" -> (5, 4)))
    }
  }

  test("fails fast on an invalid fraction") {
    intercept[IllegalArgumentException] { Sampling.byKeyHash(rows, Seq("k"), 3, 2) }
    intercept[IllegalArgumentException] { Sampling.byKeyHash(rows, Seq("k"), 1, 0) }
  }

  test("takePerGroup: caps respected, kept rows are the k smallest hashes per group") {
    import org.apache.spark.sql.functions.col
    val docs = ((1L to 50L).map(i => (i, "big")) ++ (101L to 110L).map(i => (i, "small")))
      .toDF("doc_id", "grp")
    val out = Sampling.takePerGroup(docs, "grp", k = 8, caps = Map("small" -> 3))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byGrp = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGrp("big").size == 8 && byGrp("small").size == 3)
    // the kept set must be exactly the k smallest salted hashes per group
    val hashed = docs.select(col("doc_id"), col("grp"),
        Sampling.keyHash(Seq("doc_id"), "cap").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def expect(g: String, k: Int) =
      hashed.filter(_._2 == g).sortBy(t => (t._3, t._1)).take(k).map(_._1).toSet
    assert(byGrp("big") == expect("big", 8))
    assert(byGrp("small") == expect("small", 3))
    // groups smaller than their cap pass whole; output columns unchanged
    assert(Sampling.takePerGroup(docs, "grp", k = 1000).count() == 60)
    assert(Sampling.takePerGroup(docs, "grp", 8).columns.toSeq == Seq("doc_id", "grp"))
  }

  test("takePerGroup: deterministic across partitionings; NULL group caps as one group") {
    val docs = ((1L to 30L).map(i => (i, if (i % 2 == 0) "a" else null)) :+ (31L, "n"))
      .toDF("doc_id", "grp")
    val a = Sampling.takePerGroup(docs, "grp", 5).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    val b = Sampling.takePerGroup(docs.repartition(7), "grp", 5).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sorted.toSeq
    assert(a == b, "cap selection changed with partitioning")
    val byGrp = a.groupBy(_._2).view.mapValues(_.size).toMap
    // NULLs form ONE capped group; the real group named "n" (the internal
    // NULL key) stays separate and passes whole (1 < 5)
    assert(byGrp(None) == 5 && byGrp(Some("a")) == 5 && byGrp(Some("n")) == 1)
  }

  test("takePerGroup: cap 0 drops a group; invalid caps and column collisions fail fast") {
    val docs = (1L to 10L).map(i => (i, if (i <= 5) "keep" else "drop")).toDF("doc_id", "grp")
    val out = Sampling.takePerGroup(docs, "grp", k = 10, caps = Map("drop" -> 0))
      .collect().map(_.getString(1))
    assert(out.forall(_ == "keep") && out.length == 5)
    intercept[IllegalArgumentException] { Sampling.takePerGroup(docs, "grp", -1) }
    intercept[IllegalArgumentException] {
      Sampling.takePerGroup(docs, "grp", 1, caps = Map("x" -> -2))
    }
    intercept[IllegalArgumentException] {
      Sampling.takePerGroup(docs.withColumn("_g",
        org.apache.spark.sql.functions.lit(1)), "grp", 1)
    }
  }
}

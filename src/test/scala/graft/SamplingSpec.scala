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
}

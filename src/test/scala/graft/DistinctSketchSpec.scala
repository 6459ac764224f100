package graft

import org.apache.spark.sql.functions._

import graft.operators.DistinctSketch

/** The portable distinct sketch's contracts: registers match an
  * independent driver-side md5-HLL reference, the state monoid is exact
  * (merge/rollup == direct, any split, any partitioning, duplicates
  * absorbed), and the estimate read stays within HLL error of exact
  * distinct counts across cardinality regimes (linear-counting small
  * range included). The STATE is oracle-gated (q223/q224); the estimate
  * is approximate by nature and pinned here, like SketchRollupSpec does
  * for the opaque-bytes built-in. */
class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: md5 via MessageDigest, same slice layout. */
  private def refRegisters(values: Seq[String], hexChars: Int): Map[Int, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    values.distinct.map { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hex.take(hexChars), 16)
      val suffix = hex.slice(hexChars, hexChars + 16)
      val bits = suffix.flatMap { c =>
        val v = Integer.parseInt(c.toString, 16)
        (3 to 0 by -1).map(b => (v >> b) & 1)
      }
      val rho = bits.indexOf(1) match { case -1 => 65L; case i => i + 1L }
      (bucket, rho)
    }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
  }

  private def gotRegisters(df: org.apache.spark.sql.DataFrame,
                           hexChars: Int): Map[Int, Long] =
    DistinctSketch.registers(df, Nil, "v", hexChars)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap

  test("registers match the driver-side md5-HLL reference (strings and longs)") {
    val strs = (1 to 500).map(i => s"doc-$i")
    assert(gotRegisters(strs.toDF("v"), 2) == refRegisters(strs, 2))
    val longs = (1L to 300L).map(_ * 7919L)
    assert(gotRegisters(longs.toDF("v"), 2) ==
      refRegisters(longs.map(_.toString), 2))
    assert(gotRegisters(strs.toDF("v"), 1) == refRegisters(strs, 1))
  }

  test("state monoid: sketch(A ∪ B) == merge(sketch(A), sketch(B)), duplicates absorbed") {
    val a = (1 to 400).map(i => ("g", s"u$i"))
    val b = (200 to 700).map(i => ("g", s"u$i")) // overlap 200..400
    def sk(xs: Seq[(String, String)]) =
      DistinctSketch.sketch(xs.toDF("g", "v"), Seq("g"), "v")
        .collect()(0).getSeq[Long](1)
    val merged = sk(a).zip(sk(b)).map { case (x, y) => math.max(x, y) }
    assert(sk(a ++ b) == merged.toSeq)
    // idempotent: duplicating the whole input changes nothing
    assert(sk(a ++ a) == sk(a))
  }

  test("rollup of per-cell sketches == direct coarser sketch, any partitioning") {
    val rows = (1 to 1000).map(i => (s"t${i % 3}", s"d${i % 7}", s"user-${i % 211}"))
    val df = rows.toDF("typ", "day", "v")
    val fine = DistinctSketch.sketch(df, Seq("typ", "day"), "v")
    val rolled = DistinctSketch.rollup(fine, "sketch", 2, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val direct = DistinctSketch.sketch(df, Seq("typ"), "v")
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(rolled.toSeq == direct.toSeq)
    val shuffled = DistinctSketch.rollup(fine.repartition(17, col("day")),
        "sketch", 2, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(shuffled.toSeq == direct.toSeq)
  }

  test("rollup RAISES on a sketch whose length disagrees with hexChars") {
    val fine = DistinctSketch.sketch(
      (1 to 10).map(i => ("g", s"u$i")).toDF("g", "v"), Seq("g"), "v", 2)
    intercept[Exception](
      DistinctSketch.rollup(fine, "sketch", 1, Seq("g")).collect())
  }

  test("estimate within HLL error of exact across cardinality regimes") {
    // m=256 -> rsd ~6.5%; allow 3*rsd = 20%. Small range rides linear
    // counting and is much tighter.
    for (n <- Seq(25, 400, 20000)) {
      val df = (1 to n).map(i => s"item-$i").toDF("v")
      val sk = DistinctSketch.sketch(df, Nil, "v")
      val got = sk.select(DistinctSketch.estimate(col("sketch"), 2))
        .collect()(0).getLong(0)
      assert(math.abs(got - n) <= math.max(2L, (n * 0.20).toLong),
        s"n=$n est=$got")
    }
  }

  test("empty and single-value sketches read 0 and 1 exactly") {
    val empty = DistinctSketch.sketch(
      Seq.empty[String].toDF("v"), Nil, "v")
    assert(empty.select(DistinctSketch.estimate(col("sketch"), 2))
      .collect()(0).getLong(0) == 0L)
    val one = DistinctSketch.sketch(
      Seq("x", "x", "x").toDF("v"), Nil, "v")
    assert(one.select(DistinctSketch.estimate(col("sketch"), 2))
      .collect()(0).getLong(0) == 1L)
  }

  test("NULL values carry no distinct member; bad hexChars raises") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    val sk = DistinctSketch.sketch(df, Nil, "v")
    val est = sk.select(DistinctSketch.estimate(col("sketch"), 2))
      .collect()(0).getLong(0)
    assert(est == 2L, s"NULLs counted: $est")
    intercept[IllegalArgumentException](
      DistinctSketch.sketch(df, Nil, "v", hexChars = 3))
    intercept[IllegalArgumentException](
      DistinctSketch.sketch(df, Nil, "v", hexChars = 0))
  }

  test("intersection estimate: inclusion-exclusion lands near the true overlap") {
    // |A| = 1000, |B| = 1000, |A∩B| = 500 — operand errors add, allow 30%
    val a = (1 to 1000).map(i => s"k$i")
    val b = (501 to 1500).map(i => s"k$i")
    def sk(xs: Seq[String]) = DistinctSketch.sketch(xs.toDF("v"), Nil, "v")
    val got = sk(a).crossJoin(sk(b).withColumnRenamed("sketch", "sk_b"))
      .select(DistinctSketch.estimateIntersection(col("sketch"), col("sk_b"), 2))
      .collect()(0).getLong(0)
    assert(math.abs(got - 500L) <= 150L, s"intersection est $got vs 500")
    // disjoint sets floor at 0, never negative
    val dj = sk((1 to 300).map(i => s"x$i"))
      .crossJoin(sk((1 to 300).map(i => s"y$i")).withColumnRenamed("sketch", "sk_b"))
      .select(DistinctSketch.estimateIntersection(col("sketch"), col("sk_b"), 2))
      .collect()(0).getLong(0)
    assert(dj >= 0L && dj <= 60L, s"disjoint est $dj")
  }

  test("summary orders by group and estimates per cell") {
    val rows = (1 to 600).map(i => (s"t${i % 2}", s"u${i % 150}"))
    val got = DistinctSketch.summary(rows.toDF("g", "v"), Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == Seq("t0", "t1"))
    val exact = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.size }
    got.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)) <= math.max(2L, (exact(g) * 0.20).toLong),
        s"$g est=$est exact=${exact(g)}") }
  }
}

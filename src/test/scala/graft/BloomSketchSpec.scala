package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomSketch

/** The portable Bloom filter's contracts: words match an independent
  * driver-side md5/double-hash reference, the state monoid is exact
  * (OR-merge/rollup == direct, any split, duplicates absorbed), and —
  * the filter's defining theorem — membership reads have NO FALSE
  * NEGATIVES: every inserted value reads present, so a clear read is
  * certain absence. False positives are bounded (measured against the
  * filter's own fpRate read), the fill-ratio estimate lands within
  * band, and the sparse/scale read path (containsSparse / hitCounts —
  * the decontamination pre-filter core) agrees exactly with the dense
  * read. The word state AND the membership verdicts are oracle-gated
  * (q251–q254); the spec pins the reference arithmetic and the
  * one-sided-error property the gates build on. */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: md5 via MessageDigest, the 63-bit word
    * layout, Kirsch–Mitzenmacher probes on the two 60-bit hex slices. */
  private def refPositions(s: String, numWords: Int, k: Int): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val m = 63L * numWords
    val h1 = java.lang.Long.parseLong(hex.take(15), 16) % m
    val h2 = java.lang.Long.parseLong(hex.slice(15, 30), 16) % m
    (0 until k).map(i => (h1 + i * (2 * h2 + 1)) % m)
  }

  private def refWords(values: Seq[String], numWords: Int,
                       k: Int): Map[Long, Long] =
    values.flatMap(refPositions(_, numWords, k))
      .groupBy(_ / 63)
      .map { case (slot, ps) =>
        slot -> ps.map(p => 1L << (p % 63).toInt).reduce(_ | _) }

  private def gotWords(df: org.apache.spark.sql.DataFrame, numWords: Int,
                       k: Int): Map[Long, Long] =
    BloomSketch.registers(df, Nil, "v", numWords, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sparse words match the driver-side md5 double-hash reference") {
    val strs = (1 to 500).map(i => s"doc-$i")
    assert(gotWords(strs.toDF("v"), 256, 4) == refWords(strs, 256, 4))
    val longs = (1L to 300L).map(_ * 7919L)
    assert(gotWords(longs.toDF("v"), 256, 4) ==
      refWords(longs.map(_.toString), 256, 4))
    // small filter, different k — and every stored word is non-negative
    // (the 63-bit portability layout never touches the sign bit)
    val small = gotWords(strs.toDF("v"), 8, 2)
    assert(small == refWords(strs, 8, 2))
    assert(small.values.forall(_ > 0L))
  }

  test("dense sketch == densified sparse words; empty input -> one all-zero row") {
    val rows = (1 to 400).map(i => s"u$i")
    val dense = BloomSketch.sketch(rows.toDF("v"), Nil, "v", 64, 4)
      .collect()(0).getSeq[Long](0)
    val sparse = refWords(rows, 64, 4)
    assert(dense.size == 64)
    assert(dense.zipWithIndex.forall { case (w, j) =>
      w == sparse.getOrElse(j.toLong, 0L) })
    val empty = BloomSketch.sketch(Seq.empty[String].toDF("v"), Nil, "v",
      8, 4).collect()
    assert(empty.length == 1 && empty(0).getSeq[Long](0) == Seq.fill(8)(0L))
  }

  test("state monoid: sketch(A ∪ B) == OR-merge, duplicates/re-merge absorbed") {
    val a = (1 to 400).map(i => s"u$i")
    val b = (200 to 700).map(i => s"u$i") // overlap 200..400
    val wa = gotWords(a.toDF("v"), 32, 4)
    val wb = gotWords(b.toDF("v"), 32, 4)
    val merged = (wa.keySet ++ wb.keySet).map(s =>
      s -> (wa.getOrElse(s, 0L) | wb.getOrElse(s, 0L))).toMap
    assert(gotWords((a ++ b).toDF("v"), 32, 4) == merged)
    // idempotent: duplicating the whole input changes nothing
    assert(gotWords((a ++ a).toDF("v"), 32, 4) == wa)
    // merge() on dense columns agrees
    val da = BloomSketch.sketch(a.toDF("v"), Nil, "v", 32, 4, out = "x")
    val db = BloomSketch.sketch(b.toDF("v"), Nil, "v", 32, 4, out = "y")
    val both = da.crossJoin(db)
      .select(BloomSketch.merge(col("x"), col("y")).as("m"))
      .collect()(0).getSeq[Long](0)
    assert(both.zipWithIndex.forall { case (w, j) =>
      w == merged.getOrElse(j.toLong, 0L) })
  }

  test("rollup of per-cell sketches == direct coarser sketch; length mismatch RAISES") {
    val rows = (1 to 900).map(i => (s"t${i % 3}", s"d${i % 5}", s"user-${i % 211}"))
    val df = rows.toDF("typ", "day", "v")
    val fine = BloomSketch.sketch(df, Seq("typ", "day"), "v", 16, 4)
    val direct = BloomSketch.sketch(df, Seq("typ"), "v", 16, 4)
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    val rolled = BloomSketch.rollup(fine, "bloom", 16, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(rolled.toSeq == direct.toSeq)
    val shuffled = BloomSketch.rollup(fine.repartition(17, col("day")),
        "bloom", 16, Seq("typ"))
      .orderBy("typ").collect().map(r => (r.getString(0), r.getSeq[Long](1)))
    assert(shuffled.toSeq == direct.toSeq)
    intercept[Exception](
      BloomSketch.rollup(fine, "bloom", 8, Seq("typ")).collect())
  }

  test("NO FALSE NEGATIVES: every inserted value reads present (the Bloom theorem)") {
    val members = (1 to 300).map(i => s"m$i")
    val sk = BloomSketch.sketch(members.toDF("v"), Nil, "v", 64, 4)
    val reads = sk.crossJoin(members.toDF("p"))
      .select(BloomSketch.mightContain(col("bloom"), col("p"), 64, 4)
        .as("hit"))
      .collect().map(_.getBoolean(0))
    assert(reads.length == 300 && reads.forall(identity))
    // and through the sparse/scale read path
    val state = BloomSketch.sketchSparse(members.toDF("v"), Nil, "v", 64, 4)
    val sparseReads = BloomSketch.containsSparse(state,
        members.toDF("p"), Nil, "p", 64, 4)
      .collect().map(_.getBoolean(1))
    assert(sparseReads.length == 300 && sparseReads.forall(identity))
  }

  test("false positives bounded by the filter's own fpRate read; empty filter reads all-absent") {
    val members = (1 to 300).map(i => s"m$i")
    val sk = BloomSketch.sketch(members.toDF("v"), Nil, "v", 64, 4)
    val fpr = sk.select(BloomSketch.fpRate(col("bloom"), 64, 4))
      .collect()(0).getDouble(0)
    assert(fpr > 0.0 && fpr < 0.05, s"unexpected fill: fpr=$fpr")
    val strangers = (1 to 2000).map(i => s"x$i")
    val fps = sk.crossJoin(strangers.toDF("p"))
      .select(BloomSketch.mightContain(col("bloom"), col("p"), 64, 4)
        .as("hit"))
      .collect().count(_.getBoolean(0))
    assert(fps <= math.max(5.0, 3 * fpr * 2000),
      s"$fps false positives at fpr=$fpr")
    // empty filter: no bits, 0 estimate, every read absent
    val none = BloomSketch.sketch(Seq.empty[String].toDF("v"), Nil, "v", 8, 4)
    val row = none.crossJoin(Seq("z").toDF("p")).select(
      BloomSketch.setBits(col("bloom")),
      BloomSketch.estimate(col("bloom"), 8, 4),
      BloomSketch.mightContain(col("bloom"), col("p"), 8, 4)).collect()(0)
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L && !row.getBoolean(2))
  }

  test("fill-ratio estimate lands within band") {
    for (n <- Seq(50, 300, 900)) {
      val sk = BloomSketch.sketch((1 to n).map(i => s"v$i").toDF("v"),
        Nil, "v", 64, 4)
      val est = sk.select(BloomSketch.estimate(col("bloom"), 64, 4))
        .collect()(0).getLong(0)
      assert(math.abs(est - n) <= math.max(4.0, 0.15 * n), s"n=$n est=$est")
    }
  }

  test("hitCounts: sound per-doc triage — true overlap ALWAYS flags; counts match the reference") {
    // blocklist = b1..b50; docs: d1 overlaps (b10, b20 + own), d2 clean,
    // d3 entirely blocklist, d4 clean with duplicates (distinct counted)
    val block = (1 to 50).map(i => s"b$i")
    val docs = Seq(
      1L -> Seq("b10", "b20", "own1", "own2"),
      2L -> Seq("c1", "c2", "c3"),
      3L -> Seq("b1", "b2", "b3"),
      4L -> Seq("e1", "e1", "e2")
    ).flatMap { case (id, vs) => vs.map(id -> _) }
    val state = BloomSketch.sketchSparse(block.toDF("v"), Nil, "v", 256, 3)
    val got = BloomSketch.hitCounts(state, docs.toDF("doc_id", "v"),
        Seq("doc_id"), "v", 256, 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // n_values counts DISTINCT values; n_maybe >= the true overlap
    // (Bloom soundness), and equals the reference filter's verdicts
    val ref = refWords(block, 256, 3)
    def refHit(v: String) = refPositions(v, 256, 3).forall(p =>
      (ref.getOrElse(p / 63, 0L) & (1L << (p % 63).toInt)) != 0L)
    val expected = Seq(
      (1L, 4L, Seq("b10", "b20", "own1", "own2").count(refHit).toLong),
      (2L, 3L, Seq("c1", "c2", "c3").count(refHit).toLong),
      (3L, 3L, 3L), // all inserted -> all flagged, no escape possible
      (4L, 2L, Seq("e1", "e2").count(refHit).toLong))
    assert(got.toSeq == expected)
    assert(got(0)._3 >= 2L) // d1's two true overlaps can never be missed
    // parity with the per-value read, and the shuffle-join path agrees
    val perValue = BloomSketch.containsSparse(state,
        docs.toDF("doc_id", "v"), Seq("doc_id"), "v", 256, 3)
      .groupBy("doc_id")
      .agg(sum(when(col("might_contain"), 1L).otherwise(0L)).as("nm"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perValue.toSeq == got.map(t => (t._1, t._3)).toSeq)
    val noBcast = BloomSketch.hitCounts(state, docs.toDF("doc_id", "v"),
        Seq("doc_id"), "v", 256, 3, broadcastState = false)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(noBcast.toSeq == got.toSeq)
  }

  test("decontamPrefilter: certified-clean docs provably share no gram; contaminated always flagged") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (200L, "one two three four five six"))
    val corpus = Seq(
      // contains the bench 4-gram "beta gamma delta epsilon"
      (1L, "xx beta gamma delta epsilon yy"),
      // shares words but no 4-gram
      (2L, "alpha beta zeta gamma delta"),
      // disjoint
      (3L, "p q r s t u v w"),
      // too short for a 4-gram -> absent
      (4L, "a b c"))
    val out = graft.text.Pipeline.decontamPrefilter(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        n = 4, numWords = 1024, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(1L)._4 == 1L && byId(1L)._3 >= 1L) // soundness: never missed
    assert(byId(1L)._2 == 3L) // 6 words -> 3 distinct 4-grams
    assert(byId(2L)._2 == 2L)
    // docs 2 and 3 may only be flagged by a false positive — at
    // m = 63·1024 bits with 6 bench grams, never in practice
    assert(byId(3L)._3 == 0L && byId(3L)._4 == 0L)
  }

  test("decontaminateNgramsPrefiltered == decontaminateNgrams row-for-row (the soundness composition)") {
    // seeded corpus with planted overlap, clean docs, short docs, and a
    // NULL text — every survival class the equivalence must preserve
    val rng = new scala.util.Random(41)
    def sentence(words: Int) =
      Seq.fill(words)(s"w${rng.nextInt(40)}").mkString(" ")
    val bench = (100L to 104L).map(id => (id, sentence(12)))
    val corpus = (0L until 60L).map { id =>
      if (id % 7 == 0) {
        // embed a benchmark span in a novel wrapper
        val b = bench((id % 5).toInt)._2
        (id, s"pre $b post")
      } else if (id % 11 == 0) (id, "a b") // too short for a 4-gram
      else (id, sentence(10))
    } ++ Seq((99L, null.asInstanceOf[String]))
    val docsDf = corpus.toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")
    val plain = graft.text.Pipeline.decontaminateNgrams(docsDf, benchDf, 4)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    val pre = graft.text.Pipeline.decontaminateNgramsPrefiltered(
        docsDf, benchDf, 4, numWords = 512, k = 3)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(pre == plain)
    // the planted contaminated docs really were dropped by both
    assert(!plain.map(_._1).exists(id => id % 7 == 0 && id < 60))
  }

  test("containsSparse plans the broadcast probe (no shuffle of the probe side)") {
    val state = BloomSketch.sketchSparse(
      (1 to 100).map(i => s"m$i").toDF("v"), Nil, "v", 64, 4)
    val plan = BloomSketch.containsSparse(state,
        (1 to 50).map(i => s"p$i").toDF("v"), Nil, "v", 64, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast probe join:\n$plan")
  }

  test("sizeFor: the computed (numWords, k) delivers ~the target FPR on planted data") {
    val (w1, k1) = BloomSketch.sizeFor(10000, 0.01)
    assert(mBits(w1) >= 90000 && k1 >= 5 && k1 <= 8, s"($w1, $k1)")
    val members = (1 to 10000).map(i => s"m$i")
    val sk = graft.operators.BloomSketch.sketchSparse(
      members.toDF("v"), Nil, "v", w1, k1)
    val strangers = (1 to 20000).map(i => s"x$i").toDF("v")
    val fp = BloomSketch.containsSparse(sk, strangers, Nil, "v", w1, k1)
      .filter(col("might_contain")).count()
    assert(fp <= 3 * 0.01 * 20000, s"$fp false positives")
    // tiny and huge inputs stay in range
    val (w2, k2) = BloomSketch.sizeFor(1, 0.5)
    assert(w2 >= 1 && k2 >= 1)
    assert(BloomSketch.sizeFor(Long.MaxValue / 4, 0.001)._1 ==
      BloomSketch.sparseMaxWords)
    intercept[IllegalArgumentException](BloomSketch.sizeFor(0, 0.1))
    intercept[IllegalArgumentException](BloomSketch.sizeFor(10, 1.5))
  }

  private def mBits(w: Int): Long = BloomSketch.mBits(w)

  test("guards: k range, word caps, column hygiene, state shape") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException](
      BloomSketch.sketchSparse(df, Nil, "v", 8, k = 0))
    intercept[IllegalArgumentException](
      BloomSketch.sketchSparse(df, Nil, "v", 8, k = 9))
    intercept[IllegalArgumentException](
      BloomSketch.sketchSparse(df, Nil, "v", 0))
    intercept[IllegalArgumentException](
      BloomSketch.sketch(df, Nil, "v", 65)) // dense cap
    intercept[IllegalArgumentException](
      BloomSketch.sketchSparse(df, Nil, "nope", 8))
    intercept[IllegalArgumentException](
      BloomSketch.sketchSparse(Seq("a").toDF("__x"), Nil, "__x", 8))
    intercept[IllegalArgumentException](
      BloomSketch.containsSparse(Seq((1L, 2L)).toDF("bad", "w"),
        df, Nil, "v", 8))
  }
}

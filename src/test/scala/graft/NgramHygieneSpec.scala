package graft

import org.apache.spark.sql.functions._

import graft.text.{Pipeline, TextAnalysis, TextOps}

/** N-gram span hygiene: overlap decontamination (q69) and the
  * cross-corpus duplicated-n-gram fraction (q70), checked against
  * hand-computed fixtures and a brute-force reimplementation. */
class NgramHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // brute-force word n-grams of one text, matching the operator contract
  private def grams(text: String, n: Int): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < n) Seq.empty
    else (0 to ws.length - n).map(i => ws.slice(i, i + n).mkString(" "))
  }

  test("wordNgrams keeps duplicates, order, and the short-doc guard") {
    val d = docsDF(1L -> "a b a b a", 2L -> "x y", 3L -> "p q r s")
    val out = d.select(col("doc_id"), TextOps.wordNgrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b a", "b a b", "a b a")) // dup kept, in order
    assert(out(2L).isEmpty) // 2 tokens < n: guarded empty, not sequence-down
    assert(out(3L) == Seq("p q r", "q r s"))
  }

  test("decontaminateNgrams catches an EMBEDDED eval span that the whole-doc fingerprint misses") {
    val eval = docsDF(100L -> "the secret eval answer key")
    val docs = docsDF(
      1L -> "totally novel training prose here",
      // eval text embedded inside an otherwise-novel doc: different
      // bag-of-words fingerprint, shared 4-grams
      2L -> "intro words then the secret eval answer key and more trailing text",
      3L -> "another clean document entirely")
    val survivors = Pipeline.decontaminateNgrams(docs, eval, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L), s"got $survivors")
    // the CONTRAST: q57's whole-document fingerprint does NOT catch it
    val fpSurvivors = Pipeline.decontaminate(docs, eval)
      .collect().map(_.getLong(0)).toSet
    assert(fpSurvivors == Set(1L, 2L, 3L),
      "fingerprint decontamination unexpectedly caught the embedded span")
  }

  test("a blocklist doc under n tokens contaminates nothing — even its own exact copy") {
    val eval = docsDF(100L -> "too short")
    val docs = docsDF(1L -> "too short", 2L -> "something else longer than that")
    // neither side produces a 4-gram, so nothing matches: both survive
    val survivors = Pipeline.decontaminateNgrams(docs, eval, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 2L))
  }

  test("decontaminateNgrams matches brute force on a random corpus") {
    val rnd = new scala.util.Random(6)
    val vocab = Vector("a", "b", "c", "d", "e")
    def text() = Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val rows = (1L to 120L).map(i => i -> text())
    val docs = docsDF(rows: _*)
    val block = rows.filter(_._1 % 11 == 0)
    val n = 4
    val blockGrams = block.flatMap(r => grams(r._2, n)).toSet
    val expected = rows.filter(r => grams(r._2, n).forall(g => !blockGrams.contains(g)))
      .map(_._1).toSet
    val got = Pipeline.decontaminateNgrams(docs, docsDF(block: _*), n)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("duplicatedNgramStats: unique spans, exact dups, intra-doc repeats, short docs") {
    val d = docsDF(
      1L -> "w1 w2 w3 w4 w5",      // all grams unique to doc 1... except shared with 2
      2L -> "w1 w2 w3 w4 w5",      // exact dup of 1: every gram duplicated
      3L -> "z1 z2 z3 z4",         // unique spans: 0 dup
      4L -> "r p r p r p r p",     // intra-doc repetition: grams repeat WITHIN the doc
      5L -> "a b")                 // under n tokens: zeros
    val out = TextAnalysis.duplicatedNgramStats(d, n = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 2L, 1000L))) // both grams also in doc 2
    assert(out(2L) == ((2L, 2L, 1000L)))
    assert(out(3L) == ((1L, 0L, 0L)))
    // "r p r p r p r p": 5 grams, "r p r p" ×3 and "p r p r" ×2 — all 5
    // occurrences are of grams seen more than once
    assert(out(4L) == ((5L, 5L, 1000L)))
    assert(out(5L) == ((0L, 0L, 0L))) // present with zeros, not dropped
  }

  test("duplicatedNgramStats matches brute force on a random corpus") {
    val rnd = new scala.util.Random(60)
    val vocab = Vector("u", "v", "w", "x")
    def text() = Seq.fill(2 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val rows = (1L to 150L).map(i => i -> text())
    val n = 3
    val all = rows.flatMap(r => grams(r._2, n))
    val tot = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = rows.map { case (id, tx) =>
      val gs = grams(tx, n)
      val dup = gs.count(g => tot(g) > 1).toLong
      val nG = gs.size.toLong
      id -> ((nG, dup, if (nG == 0) 0L else 1000L * dup / nG))
    }.toMap
    val got = TextAnalysis.duplicatedNgramStats(docsDF(rows: _*), n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }
}

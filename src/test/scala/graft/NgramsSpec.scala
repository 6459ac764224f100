package graft


import graft.text.Ngrams

/** Skip-grams changed shape in round 3 (delta-exploded equi-join on
  * (doc_id, pos) instead of a doc_id join + radius post-filter, which built
  * O(len²) intermediate pairs per doc) — brute-force parity plus a plan
  * assertion that the position really is a join key. */
class NgramsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def brute(rows: Seq[(Long, String)], radius: Int): Map[(String, String), Long] =
    rows.flatMap { case (_, text) =>
      val ws = text.split(" ")
      for {
        i <- ws.indices
        j <- math.max(0, i - radius) to math.min(ws.length - 1, i + radius)
        if j != i
      } yield (ws(i), ws(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("skipgram pair counts match the brute-force window, radius 1..3") {
    val rows = Seq(
      1L -> "a b c d e f g",
      2L -> "a a b b a",
      3L -> "x",
      4L -> "p q")
    for (r <- 1 to 3) {
      val expect = brute(rows, r)
      val got = Ngrams.skipgramPairs(docs(rows: _*), radius = r, k = 1000)
        .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
      assert(got == expect, s"radius=$r")
    }
  }

  test("skipgram join is keyed on (doc_id, pos) — no radius post-filter blowup") {
    val plan = Ngrams.skipgramPairs(docs(1L -> "a b c"), radius = 2, k = 10)
      .queryExecution.executedPlan.toString
    // the position must appear inside the join keys, not a Filter above it
    val joinLine = plan.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(joinLine.contains("pos"), s"pos not a join key:\n$joinLine")
  }

  test("postings: sorted lists, exact df, hot terms elided above maxDf") {
    val d = docs(3L -> "a b", 1L -> "a b c", 2L -> "b a")
    val out = Ngrams.postings(d, maxDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(out == Seq(
      ("a", 3L, None),                 // df 3 > maxDf → elided
      ("b", 3L, None),
      ("c", 1L, Some("1"))))
  }

  test("vocab: frequency-ranked, minCount-truncated, distributed (no global window)") {
    val d = docs(1L -> "b a a b b c", 2L -> "a b b d")
    val out = Ngrams.vocab(d, minCount = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // b: 5, a: 3, c: 1 (cut), d: 1 (cut)
    assert(out.toSeq == Seq(("b", 5L, 1L), ("a", 3L, 2L)), s"got ${out.toSeq}")
    // distributed rank: the plan must not contain a partitionless Window
    val plan = Ngrams.vocab(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"vocab rank fell back to a window:\n$plan")
  }

  test("bigram top-k per head word") {
    val out = Ngrams.topBigrams(docs(1L -> "a b a b a c"), k = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // heads: a → b (2) beats a → c (1); b → a (2)
    assert(out.toSet == Set(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("bigramScore: predictable text outscores word salad; short docs absent; modes agree") {
    // docs 1-2 share the template (high conditional probabilities); doc 3
    // reuses the COMMON head "the" with one-off continuations — that's
    // what scores low (a rare head's one-off transition is conditionally
    // certain and correctly scores 1000); doc 4 has no bigrams at all
    val d = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "the purple the quantum the sandwich",
      4L -> "single")
    def toMap3(rows: Array[(Long, Long, Long)]) = rows.map(t => t._1 -> (t._2, t._3)).toMap
    val m = toMap3(Ngrams.bigramScore(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(!m.contains(4L), "a doc with no bigrams must be absent")
    assert(m(1L)._2 > m(3L)._2, s"template ${m(1L)} must outscore salad ${m(3L)}")
    // broadcast-free model path is identical
    val shuffled = toMap3(Ngrams.bigramScore(d, broadcastModel = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
    assert(shuffled == m)
  }
}

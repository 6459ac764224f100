package graft

import graft.text.Retrieval

/** BM25-shaped retrieval ([[Retrieval.bm25TopK]]): brute-force parity on a
  * randomized small-vocab corpus (the brute force replays the exact
  * integer formula — same floor divisions, same order), plus the
  * behavioral shapes: tf saturation, length normalization, idf ordering,
  * k truncation with doc_id tie-breaks, unmatched queries/terms, and NULL
  * text. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val K1 = 1200L
  private val B = 750L

  /** Plain-Scala replay of the operator's integer arithmetic. */
  private def brute(corpus: Seq[(Long, String)], queries: Seq[(String, String)],
                    k: Int): Set[(String, Long, Long, Long)] = {
    def toks(t: String): Array[String] = Option(t).getOrElse("").split(" ", -1)
    val lens = corpus.map { case (id, t) => id -> toks(t).length.toLong }.toMap
    val n = corpus.size.toLong
    val avg1000 = 1000L * lens.values.sum / n
    val tf = corpus.flatMap { case (id, t) => toks(t).map(w => (id, w)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    queries.flatMap { case (qid, qtext) =>
      val scored = corpus.flatMap { case (did, _) =>
        val s = toks(qtext).distinct.flatMap { w =>
          tf.get((did, w)).map { f =>
            val idf1000 = (1000L * (n - df(w))) / (df(w) + 1)
            val norm1000 = 1000L - B + (B * lens(did) * 1000L) / avg1000
            val denom = f * 1000L + (K1 * norm1000) / 1000L
            (idf1000 * f * (K1 + 1000L)) / denom
          }
        }
        if (s.isEmpty) None else Some(did -> s.sum)
      }
      scored.sortBy { case (did, s) => (-s, did) }.take(k).zipWithIndex
        .map { case ((did, s), i) => (qid, (i + 1).toLong, did, s) }
    }.toSet
  }

  private def run(corpus: Seq[(Long, String)], queries: Seq[(String, String)],
                  k: Int): Set[(String, Long, Long, Long)] =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        queries.toDF("q_id", "qtext"), k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("brute-force parity on a randomized small-vocab corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("agg", "scan", "sort", "join", "key", "row", "col", "tbl")
    val corpus = (0L until 60L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val queries = Seq(("qa", "agg scan"), ("qb", "sort join key"), ("qc", "tbl"))
    for (k <- Seq(1, 5, 17))
      assert(run(corpus, queries, k) === brute(corpus, queries, k), s"k=$k")
  }

  test("tf saturation: more hits of the query term rank higher at equal length") {
    val corpus = Seq(
      1L -> "hit hit hit pad pad pad",
      2L -> "hit pad pad pad pad pad",
      3L -> "pad pad pad pad pad pad")
    val out = run(corpus, Seq(("q", "hit")), 3).toSeq.sortBy(_._2)
    assert(out.map(_._3) === Seq(1L, 2L)) // doc 3 never matches
  }

  test("length normalization: same tf, shorter doc ranks higher") {
    val corpus = Seq(
      1L -> "hit pad pad pad pad pad pad pad pad pad pad pad",
      2L -> "hit pad pad",
      3L -> "pad pad pad")
    val out = run(corpus, Seq(("q", "hit")), 2).toSeq.sortBy(_._2)
    assert(out.map(_._3) === Seq(2L, 1L))
  }

  test("idf: rarer term dominates a common one") {
    val corpus = Seq(
      1L -> "rare pad pad",   // only rare
      2L -> "common pad pad", // only common
      3L -> "common pad pad",
      4L -> "common pad pad")
    val out = run(corpus, Seq(("q", "rare common")), 4).toSeq.sortBy(_._2)
    assert(out.head._3 === 1L) // the rare-term doc outranks every common-term doc
  }

  test("score ties break on doc_id; k truncates") {
    val corpus = Seq(5L -> "hit pad", 3L -> "hit pad", 9L -> "hit pad")
    val out = run(corpus, Seq(("q", "hit")), 2).toSeq.sortBy(_._2)
    assert(out.map(_._3) === Seq(3L, 5L))
    assert(out.map(_._2) === Seq(1L, 2L))
  }

  test("unmatched query terms are ignored; hitless queries yield no rows") {
    val corpus = Seq(1L -> "hit pad", 2L -> "pad pad")
    val out = run(corpus, Seq(("q", "hit nosuchterm"), ("qq", "missing")), 5)
    assert(out.map(_._1) === Set("q"))
    assert(out.map(_._3) === Set(1L))
  }

  test("NULL text degrades to the empty doc (counted in N and avglen, never matches)") {
    val corpus = Seq(1L -> "hit pad", 2L -> null.asInstanceOf[String])
    assert(run(corpus, Seq(("q", "hit")), 5) === brute(corpus, Seq(("q", "hit")), 5))
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{Dedup, SimHash, TextAnalysis, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // a base doc and a near-duplicate (one word changed), plus unrelated docs
  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val near = "the quick brown fox jumps over the lazy cat again and again today"
  private val far1 = "completely different content about database engines and query plans"
  private val far2 = "spark catalyst optimizer pushes filters below projections every time"

  test("exact dedup groups identical word-bags, rep = min doc_id") {
    val d = docs(1L -> base, 2L -> base, 3L -> far1, 4L -> ("  " + base).trim)
    val out = Dedup.exact(d).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 3L, 3L -> 1L)) // docs 1,2,4 collapse; 3 alone
  }

  test("exact dedup: hashed 16-byte groupBy key ≡ full-fingerprint key; no fp in the shuffle") {
    val d = docs(1L -> base, 2L -> base, 3L -> far1, 4L -> far2, 5L -> near, 6L -> near)
    val hashed = Dedup.exactHashed(d).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = Dedup.exact(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hashed == full)
    // the exchange must carry the two 8-byte hashes, never the fp string
    val exchange = Dedup.exactHashed(d).queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("hashpartitioning")).getOrElse("")
    assert(exchange.contains("fph1") && !exchange.contains("fp#"),
      s"fingerprint string in the shuffle key:\n$exchange")
  }

  test("jaccardPairs: broadcast-free verify mode matches the broadcast mode") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2, 5L -> base)
    val bc = Dedup.jaccardPairs(d, num = 3, den = 4)
      .collect().map(r => r.toSeq).toSeq
    val sh = Dedup.jaccardPairs(d, num = 3, den = 4, broadcastVerify = false)
      .collect().map(r => r.toSeq).toSeq
    assert(bc == sh)
    // the contract is "no FORCED broadcast": broadcastVerify=false must not
    // plant hints (Spark may still auto-broadcast small sides by size
    // estimate — that's the graceful degradation, not a violation)
    val hinted = Dedup.jaccardPairs(d, 3, 4).queryExecution.logical.toString
    val unhinted = Dedup.jaccardPairs(d, 3, 4, broadcastVerify = false)
      .queryExecution.logical.toString
    assert(hinted.toLowerCase.contains("broadcast"))
    assert(!unhinted.toLowerCase.contains("broadcast"),
      "broadcastVerify=false still plants a broadcast hint")
  }

  test("language markers containing quotes stay data, not SQL") {
    val d = docs(1L -> "it's a don't won't day", 2L -> "plain words only here")
    val out = TextAnalysis.langIdEnglish(d, markers = Seq("it's", "don't"), threshold1000 = 100)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("en_cnt"))).toMap
    assert(out == Map(1L -> 2L, 2L -> 0L))
    val q = TextAnalysis.quality(d, stopwords = Seq("it's")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("stop_cnt"))).toMap
    assert(q == Map(1L -> 1L, 2L -> 0L))
  }

  test("minhash signatures are deterministic and near-dups mostly agree") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2)
    val sig1 = Dedup.minhashSignatures(d, 16).collect()
    val sig2 = Dedup.minhashSignatures(d, 16).collect()
    assert(sig1.sameElements(sig2))
    val byDoc = sig1.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq)
    val agreeNear = byDoc(1L).zip(byDoc(2L)).count { case (a, b) => a == b }
    val agreeFar = byDoc(1L).zip(byDoc(3L)).count { case (a, b) => a == b }
    assert(agreeNear > agreeFar, s"near=$agreeNear far=$agreeFar")
    assert(agreeNear >= 8, s"one-word-change docs should share most minhashes, got $agreeNear/16")
  }

  test("LSH banding surfaces the planted near-dup pair without all-pairs") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2)
    val sig = Dedup.minhashSignatures(d, 16)
    val pairs = Dedup.lshCandidatePairs(sig, bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.contains((3L, 4L)), s"unrelated docs bucketed together: $pairs")
  }

  test("nearDedup end-to-end: planted near-dups cluster, unrelated stay apart") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2, 5L -> near, 6L -> "tiny doc")
    val out = Dedup.nearDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(5L) == 1L,
      s"planted near-dups not clustered: $out")
    assert(out(3L) == 3L && out(4L) == 4L && out(6L) == 6L,
      s"unrelated docs merged: $out")
  }

  test("clusters: min-label propagation over candidate edges") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2, 5L -> near)
    val edges = Seq((1L, 2L), (2L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(d.select("doc_id"), edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("char-gram jaccardPairs: catches a reordering word-Jaccard misses; short docs excluded") {
    // same words reordered → word-set Jaccard 1.0 AND char-gram overlap high;
    // a doc under 3 chars has no char-grams and must never pair
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> "ab")
    val out = Dedup.jaccardPairs(d, num = 3, den = 4, tokensOf = TextOps.charGrams3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)), s"got $out")
    // oracle parity of the set extractor itself: distinct char 3-grams
    val grams = d.filter($"doc_id" === 4L).select(TextOps.charGrams3).collect()(0).getSeq[String](0)
    assert(grams.isEmpty)
    val g1 = d.filter($"doc_id" === 1L).select(TextOps.charGrams3).collect()(0).getSeq[String](0)
    assert(g1.length == g1.distinct.length && g1.forall(_.length == 3))
  }

  test("jaccardPairsBitmap ≡ jaccardPairs on word sets and char-gram sets") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1, 4L -> far2, 5L -> base, 6L -> "ab")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(Dedup.jaccardPairsBitmap(d, 3, 4)) == rows(Dedup.jaccardPairs(d, 3, 4)))
    assert(rows(Dedup.jaccardPairsBitmap(d, 4, 5, tokensOf = TextOps.charGrams3)) ==
      rows(Dedup.jaccardPairs(d, 4, 5, tokensOf = TextOps.charGrams3)))
    // low positive threshold: near-all pairs — exercises wide bitmaps; the
    // broadcast-free mode must agree too
    assert(rows(Dedup.jaccardPairsBitmap(d, 1, 100)) ==
      rows(Dedup.jaccardPairsBitmap(d, 1, 100, broadcastRight = false)))
    // num = 0 is rejected on BOTH paths: prefix filtering cannot surface
    // disjoint pairs, so the degenerate threshold would make them diverge
    intercept[IllegalArgumentException] { Dedup.jaccardPairs(d, 0, 1) }
    intercept[IllegalArgumentException] { Dedup.jaccardPairsBitmap(d, 0, 1) }
  }

  test("clusters: empty edge set → every doc its own singleton (no NPE)") {
    // ADVICE r3 regression: SUM over the empty label relation is NULL;
    // the convergence probe must treat that as 0, not NPE on compareTo
    val d = docs(1L -> far1, 2L -> far2)
    val edges = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.clusters(d.select("doc_id"), edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("nearDedup on a corpus with no duplicate pairs → all singletons") {
    val d = docs(1L -> far1, 2L -> far2, 3L -> base)
    val out = Dedup.nearDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("jaccard pairs finds high-overlap docs via inverted index") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1)
    val out = Dedup.jaccardPairs(d, num = 3, den = 4) // >= 0.75
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("simhash: near-dups at small hamming distance, unrelated far") {
    val d = docs(1L -> base, 2L -> near, 3L -> far1)
    val fp = SimHash.fingerprints(d, 32).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)),
      s"near=${ham(fp(1L), fp(2L))} far=${ham(fp(1L), fp(3L))}")
  }

  test("rolling fingerprint is order-sensitive; bag fingerprint is not") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "gamma beta alpha")
    val fps = TextAnalysis.fingerprint(d).collect().map(_.getLong(1))
    assert(fps(0) != fps(1))
    val bags = Dedup.exact(d).collect()
    assert(bags.length == 1 && bags(0).getLong(1) == 2) // same word-bag
  }

  test("repetition metrics: boilerplate scores high, varied text low, short docs absent") {
    val d = docs(
      1L -> "buy now buy now buy now buy now",  // bigrams dominated by "buy now"/"now buy"
      2L -> "a fresh take on seven distinct words",
      3L -> "x")
    val out = TextAnalysis.repetition(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(!out.contains(3L))
    // doc 1: 7 bigram slots, 2 distinct → dup = 1000*5/7 = 714, top = 4/7 = 571
    assert(out(1L) == ((7L, 714L, 571L)), s"got ${out(1L)}")
    // doc 2: 7 words → 6 bigrams, all distinct → dup 0; top = 1000/6 = 166
    assert(out(2L) == ((6L, 0L, 166L)), s"got ${out(2L)}")
  }

  test("langIdArgmax picks the dictionary with most marker hits") {
    val d = docs(1L -> "the cat sat on the mat", 2L -> "le chat est sur le tapis")
    val out = TextAnalysis.langIdArgmax(d,
        Map("en" -> Seq("the", "on"), "fr" -> Seq("le", "est", "sur")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "en", 2L -> "fr"))
    // single-dictionary map: trivial argmax, not a greatest() arity crash
    val one = TextAnalysis.langIdArgmax(d, Map("en" -> Seq("the")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(one == Seq((1L, "en", 2L), (2L, "en", 0L)))
  }

  test("lshCandidatePairs honors `bands`: extra signature hashes are ignored") {
    // two docs agree on hashes 0-1 (band 0) and disagree on 2-3 (band 1)
    val sigs = Seq(
      (1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L), (1L, 3L, 40L),
      (2L, 0L, 10L), (2L, 1L, 20L), (2L, 2L, 99L), (2L, 3L, 98L))
      .toDF("doc_id", "i", "minhash")
    // band 0 matches → candidates with 1 band or 2 bands
    assert(Dedup.lshCandidatePairs(sigs, bands = 1, rowsPerBand = 2).count() == 1)
    assert(Dedup.lshCandidatePairs(sigs, bands = 2, rowsPerBand = 2).count() == 1)
    // docs agreeing ONLY in band 1: bands = 1 must ignore that band
    val sigs2 = Seq(
      (1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L), (1L, 3L, 40L),
      (2L, 0L, 11L), (2L, 1L, 21L), (2L, 2L, 30L), (2L, 3L, 40L))
      .toDF("doc_id", "i", "minhash")
    assert(Dedup.lshCandidatePairs(sigs2, bands = 1, rowsPerBand = 2).count() == 0)
    assert(Dedup.lshCandidatePairs(sigs2, bands = 2, rowsPerBand = 2).count() == 1)
  }

  test("quality and token counts are integer-exact") {
    val d = docs(1L -> "the the unique words here")
    val q = TextAnalysis.quality(d, Seq("the")).collect()(0)
    assert(q.getAs[Long]("n_tokens") == 5)
    assert(q.getAs[Long]("n_distinct") == 4)
    assert(q.getAs[Long]("stop1000") == 400) // 2/5
    val t = TextAnalysis.tokenCounts(d).collect()(0)
    assert(t.getAs[Long]("ws_tokens") == 5 && t.getAs[Long]("re_tokens") == 5)
  }

  test("editDistancePairs: blocked pairs scored; cross-block pairs never generated") {
    val d = docs(
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma delte", // 1 edit, same block (w0=alpha, nw=4)
      3L -> "alpha beta gamma", // same first token, different count → other block
      4L -> "omega beta gamma delta") // different first token → other block
    val out = Dedup.editDistancePairs(d, maxDist = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 1L)), s"got ${out.toSeq}")
  }

  test("editDistancePairs: distance above maxDist keeps the pair with is_dup=0") {
    val d = docs(1L -> "a xxxx", 2L -> "a yyyy")
    val out = Dedup.editDistancePairs(d, maxDist = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 4L, 0L)), s"got ${out.toSeq}")
  }

  test("xhash matches the known cross-engine value for 'hello'") {
    val h = docs(1L -> "x").select(TextOps.xhash(lit("hello"))).collect()(0).getLong(0)
    assert(h == 419982666956583591L) // == DuckDB ('0x'||substr(md5('hello'),1,15))::BIGINT
  }
}

package graft

import graft.functions.BpeTokens
import graft.text.{Bpe, Pipeline}
import org.apache.spark.sql.functions._

/** The greedy longest-match subword tokenizer: golden cases, brute-force
  * parity on adversarial strings (unicode, mixed whitespace), coverage
  * invariants, input validation, codegen participation, and the
  * pipeline-sizing integration. */
class BpeTokensSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation, independently coded: per word, longest
    * vocab prefix at the cursor by trying full lengths descending on
    * java.lang.String code points. */
  private def bruteBpe(text: String, vocab: Set[String]): Seq[String] = {
    if (text == null) return Seq.empty
    val maxLen = vocab.map(t => t.codePointCount(0, t.length)).max.max(1)
    def cps(s: String): Array[String] =
      s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    val isWs = Set(' ', '\t', '\n', '\r', '\f', '\u000B')
    val chars = cps(text)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < chars.length) {
      if (chars(i).length == 1 && isWs(chars(i).charAt(0))) i += 1
      else {
        var we = i + 1
        while (we < chars.length && !(chars(we).length == 1 && isWs(chars(we).charAt(0)))) we += 1
        while (i < we) {
          var take = 1
          var len = math.min(maxLen, we - i)
          while (len >= 2 && take == 1) {
            if (vocab.contains(chars.slice(i, i + len).mkString)) take = len
            len -= 1
          }
          out += chars.slice(i, i + take).mkString
          i += take
        }
      }
    }
    out.result()
  }

  private def run(texts: Seq[String], vocab: Seq[String]): Seq[Seq[String]] = {
    BpeTokens.register(spark)
    val arr = vocab.map(v => s"'$v'").mkString("array(", ",", ")")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), expr(s"bpe_tokens(text, $arr)").as("toks"))
      .orderBy("id").collect().map(_.getSeq[String](1)).toSeq
  }

  test("golden greedy longest-match cases") {
    assert(run(Seq("the"), Seq("th", "the", "he")) == Seq(Seq("the")))
    assert(run(Seq("they"), Seq("th", "the", "he")) == Seq(Seq("the", "y")))
    assert(run(Seq("the"), Seq("th", "he")) == Seq(Seq("th", "e")))
    // greedy is NOT optimal: 'ab' wins at cursor 0 even though 'a'+'bcd'
    // would cover more — the contract is longest-match-at-cursor
    assert(run(Seq("abcd"), Seq("ab", "bcd")) == Seq(Seq("ab", "c", "d")))
    // whitespace is never crossed
    assert(run(Seq("a b"), Seq("ab")) == Seq(Seq("a", "b")))
    // OOV falls back to single characters
    assert(run(Seq("xyz"), Seq("th")) == Seq(Seq("x", "y", "z")))
  }

  test("NULL and empty text yield empty arrays; whitespace-only too") {
    assert(run(Seq(null, "", "   ", " \t\n "), Seq("th")) ==
      Seq(Seq.empty, Seq.empty, Seq.empty, Seq.empty))
  }

  test("brute-force parity on adversarial strings, default vocab") {
    val texts = Seq(
      "the fast key order sort table scan merge",
      "spark streaming windows aggregate the данные",
      "héllo wörld the thé",
      "日本語 the テキスト",
      "a\tb\nthe\rmerge\fsort",
      "🎉the🎉 sort🎉ing",
      "  multiple   spaces  ", "singleword",
      "thethethethe", "sortsortsort", "xqzxqzxqz")
    val got = run(texts, Bpe.vocab)
    val want = texts.map(t => bruteBpe(t, Bpe.vocab.toSet))
    got.zip(want).zip(texts).foreach { case ((g, w), t) =>
      assert(g == w, s"text='$t'")
    }
  }

  test("coverage invariant: concatenated tokens rebuild each word") {
    val texts = Seq("the quick brown fox", "sort merge join", "ünïcode wörds")
    run(texts, Bpe.vocab).zip(texts).foreach { case (toks, t) =>
      assert(toks.mkString == t.split("\\s+").filter(_.nonEmpty).mkString, s"text='$t'")
    }
  }

  test("participates in whole-stage codegen") {
    BpeTokens.register(spark)
    // non-literal input so constant folding can't pre-evaluate the call
    val df = spark.range(10).select(concat(lit("the"), col("id")).as("text"))
      .select(expr("bpe_tokens(text, array('th','the'))").as("toks"))
    assert(df.collect().forall(_.getSeq[String](0).head == "the"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bpe_tokens") && plan.contains("*(1) Project"), plan)
  }

  test("input validation fails loudly") {
    BpeTokens.register(spark)
    def bad(sql: String): Unit = intercept[Exception] {
      Seq("x").toDF("text").selectExpr(sql).collect()
    }
    bad("bpe_tokens(text)")                         // arity
    bad("bpe_tokens(text, array('a'), 3)")          // arity
    bad("bpe_tokens(text, array(1, 2))")            // element type
    bad("bpe_tokens(text, text)")                   // non-foldable vocab
    bad("bpe_tokens(text, array('a', NULL))")       // NULL entry
    bad("bpe_tokens(text, array('a b'))")           // whitespace in entry
    bad("bpe_tokens(text, array(''))")              // empty entry
    bad("bpe_tokens(CAST(1 AS INT), array('a'))")   // text type
  }

  test("pipeline sizing: pack and mixture budget by BPE tokens when asked") {
    graft.functions.BpeTokens.register(spark)
    val docs = Seq(
      (1L, "the sort merge", "src0"),
      (2L, "spark spark spark spark", "src0"),
      (3L, "xq zv", "src1")).toDF("doc_id", "text", "source")
    // pack: n_tokens must equal the brute-force BPE counts
    val packed = Pipeline.pack(docs, capacityTokens = 8,
        tokenCount = Bpe.countTokens("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Seq(1L, 2L, 3L).zip(
      Seq("the sort merge", "spark spark spark spark", "xq zv")
        .map(t => bruteBpe(t, Bpe.vocab.toSet).length.toLong)).toMap
    assert(packed == expect)
    // chunk: with a BPE tokenizer the windows slice subword tokens
    val chunks = Pipeline.chunk(docs.select("doc_id", "text"), chunkTokens = 2,
        overlap = 0, tokenizer = expr(Bpe.tokensExpr("text")))
      .filter(col("doc_id") === 1L).collect()
    val toks1 = bruteBpe("the sort merge", Bpe.vocab.toSet)
    assert(chunks.map(_.getAs[String]("chunk_text")).mkString(" ") == toks1.mkString(" "))
    // mixture with a BPE budget still keeps determinism (smoke: runs, and
    // a budget covering everything keeps everything)
    val kept = Pipeline.mixture(docs, Map("src0" -> 1L, "src1" -> 1L),
      budgetTokens = 10000L, tokenCount = Bpe.countTokens("text"))
    assert(kept.count() == 3L)
  }

  /** Independent brute-force BPE merge learner (plain Scala maps). */
  private def bruteLearn(texts: Seq[String], numMerges: Int,
                         minPairCount: Long): Seq[String] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.map(_.toString).toList, c) }
    val merges = Seq.newBuilder[String]
    var done = false
    var r = 0
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; Seq(a, b) <- syms.sliding(2) if syms.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minPairCount =>
          merges += a + b
          def mergeRun(syms: List[String]): List[String] = syms match {
            case x :: y :: rest if x == a && y == b => (a + b) :: mergeRun(rest)
            case x :: rest => x :: mergeRun(rest)
            case Nil => Nil
          }
          words = words.groupBy { case (syms, _) => mergeRun(syms) }
            .map { case (m, g) => (m, g.values.sum) }
        case _ => done = true
      }
      r += 1
    }
    merges.result()
  }

  test("learn: distributed merges match the brute-force BPE learner") {
    val corpora = Seq(
      Seq("aaab aaab aaab", "ab ab", "ba"),
      Seq("the them then", "there the", "nothing else matters"),
      Seq("sort sorted sorting", "merge merges merged", "sort merge"),
      Seq("x", "yy", "zzz"),
      Seq("abab abab", "baba"))
    for (texts <- corpora; k <- Seq(1, 3, 6)) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bpe.learn(docs, numMerges = k, minPairCount = 2L)
      val want = bruteLearn(texts, k, 2L)
      assert(got == want, s"corpus=$texts k=$k")
    }
  }

  test("learn: deterministic, obeys minPairCount, empty corpus yields no merges") {
    val docs = Seq((1L, "sort merge sort merge"), (2L, "sort sort")).toDF("doc_id", "text")
    val a = Bpe.learn(docs, 4)
    val b = Bpe.learn(docs.repartition(7), 4)
    assert(a == b && a.nonEmpty)
    // a floor higher than any pair count stops at round 0
    assert(Bpe.learn(docs, 4, minPairCount = 1000000L) == Seq.empty)
    assert(Bpe.learn(docs.filter(col("doc_id") < 0), 4) == Seq.empty)
    // learned merges are usable as a bpe_tokens vocabulary
    val toks = run(Seq("sort merge"), a)
    assert(toks.head.nonEmpty && toks.head.mkString == "sortmerge")
  }

  test("learn leaves no live checkpoint blocks behind") {
    val docs = Seq((1L, "abc abc abd")).toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    Bpe.learn(docs, 3)
    assert((spark.sparkContext.getPersistentRDDs.keySet.toSet -- before).isEmpty)
  }
}

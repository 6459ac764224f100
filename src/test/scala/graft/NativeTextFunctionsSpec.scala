package graft

import org.apache.spark.sql.functions._

import graft.functions.{BitmapFromRanks, CharNGrams}
import graft.text.TextOps

class NativeTextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("char_ngrams matches the HOF charGrams3 exactly, including order") {
    CharNGrams.register(spark)
    val texts = Seq(
      "", "a", "ab", "abc", "abcd", "aaaaaa", "abcabcabc",
      "the quick brown fox", "ab ab ab",
      "héllo wörld", "ρομπότ και άνθρωποι", "日本語のテキスト断片",
      "mixed ascii ünd ûnïcode", "  spaces   everywhere  ",
      "a\tb\nc", "ééé", "🎉🎉x🎉") // astral plane: 4-byte code points
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = df.select(TextOps.charGrams3Native.as("native"),
                        TextOps.charGrams3.as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
  }

  test("char_ngrams participates in whole-stage codegen and handles n != 3") {
    CharNGrams.register(spark)
    assert(Seq("abcd").toDF("text").select(expr("char_ngrams(text, 2)"))
      .collect()(0).getSeq[String](0) == Seq("ab", "bc", "cd"))
    // non-literal input so constant folding can't pre-evaluate the call
    val df = spark.range(10).select(concat(lit("ab"), col("id")).as("text"))
      .select(expr("char_ngrams(text, 2)").as("g"))
    assert(df.collect().length == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("char_ngrams") && plan.contains("*(1) Project"), plan)
    // NULL text yields [] exactly like the HOF's CASE ... ELSE array() END
    // (NULL condition falls to ELSE) — the parity contract covers NULLs
    val nullRow = Seq((null: String)).toDF("text")
      .select(TextOps.charGrams3Native.as("native"), TextOps.charGrams3.as("hof")).collect()(0)
    assert(!nullRow.isNullAt(0) && nullRow.getSeq[String](0).isEmpty)
    assert(nullRow.getSeq[String](0) == nullRow.getSeq[String](1))
    // n must be a literal
    intercept[Exception] {
      Seq(("ab", 2)).toDF("text", "n").select(expr("char_ngrams(text, n)")).collect()
    }
  }

  test("bitmap_from_ranks matches the HOF bitmap build and rejects bad ranks") {
    BitmapFromRanks.register(spark)
    val rng = new scala.util.Random(11L)
    val rows = Seq.fill(100)(Seq.fill(rng.nextInt(40) + 1)(rng.nextInt(500).toLong).distinct) :+
      Seq.empty[Long] :+ Seq(0L) :+ Seq(63L, 64L, 127L, 128L)
    val df = rows.toDF("rs")
    val out = df.select(
      expr("bitmap_from_ranks(rs)").as("native"),
      expr("""CASE WHEN size(rs) = 0 THEN array()
              |ELSE transform(sequence(0, CAST(array_max(rs) div 64 AS INT)),
              |  w -> aggregate(filter(rs, r -> CAST(r div 64 AS INT) = w),
              |    CAST(0 AS BIGINT),
              |    (acc, r) -> acc | shiftleft(CAST(1 AS BIGINT), CAST(r % 64 AS INT))))
              |END""".stripMargin).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // a negative rank must throw, not corrupt the bitmap
    intercept[Exception] {
      Seq(Seq(-1L)).toDF("rs").select(expr("bitmap_from_ranks(rs)")).collect()
    }
    intercept[Exception] { // past the documented 2^26 universe cap
      Seq(Seq(BitmapFromRanks.MaxRank)).toDF("rs")
        .select(expr("bitmap_from_ranks(rs)")).collect()
    }
    intercept[Exception] { // a NULL rank must throw, not silently set bit 0
      spark.sql("SELECT bitmap_from_ranks(array(CAST(NULL AS BIGINT), 5L))").collect()
    }
  }

  test("charGrams3Native resolves when passed to every Jaccard join entry point") {
    // the scaladoc promises the Dedup operators self-register char_ngrams;
    // each operator analyzes tokensOf in its own first select
    val d = Seq((1L, "abcdef"), (2L, "abcdeg")).toDF("doc_id", "text")
    for (df <- Seq(
        graft.text.Dedup.jaccardPairs(d, 1, 2, tokensOf = TextOps.charGrams3Native),
        graft.text.Dedup.jaccardPairsBitmap(d, 1, 2, tokensOf = TextOps.charGrams3Native),
        graft.text.Dedup.jaccardPairsBitmapBlocked(d, 1, 2, tokensOf = TextOps.charGrams3Native)))
      assert(df.count() == 1L)
  }

  test("minhash_affine matches the HOF formulation exactly, nulls and empties included") {
    graft.functions.MinhashAffine.register(spark)
    val P = graft.text.TextOps.P
    val rng = new scala.util.Random(23L)
    val rows = Seq.fill(80)(Seq.fill(rng.nextInt(30) + 1)(
        (rng.nextLong() % P + P) % P): Seq[Long]) :+
      Seq.empty[Long] :+ Seq(0L) :+ Seq(P - 1)
    val df = rows.toDF("hs")
    val out = df.select(
      expr(s"minhash_affine(hs, 16, ${P}L)").as("native"),
      expr(s"""transform(sequence(0, 15), i ->
              |  array_min(transform(hs, h ->
              |    (((2654435761 * (i+1)) % $P) * h + (40503 * (i+1)) % $P) % $P)))"""
        .stripMargin).as("hof")).collect()
    out.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)))
    // null elements are skipped like array_min skips them
    val withNull = spark.sql(
      s"SELECT minhash_affine(array(CAST(NULL AS BIGINT), 7L), 2, ${P}L) AS s").collect()
    assert(!withNull(0).getSeq[Any](0).contains(null))
  }

  test("size-band bounds are exact: any pair passing the length filter spans <= 1 band") {
    for ((num, den) <- Seq((4, 5), (1, 2), (19, 20), (2, 3), (9, 10))) {
      val bounds = graft.text.Dedup.sizeBandBounds(num, den)
      def band(nw: Long): Int = {
        val i = bounds.lastIndexWhere(_ <= nw); assert(i >= 0, s"nw=$nw"); i
      }
      for (a <- 1L to 600L; b <- a to math.min(600L, a * den / num)) {
        // (a, b) passes the filter num·max <= den·min exactly when b <= a·den/num
        assert(band(b) - band(a) <= 1,
          s"num=$num den=$den nw=($a,$b) bands=(${band(a)},${band(b)})")
      }
    }
  }

  test("word_ngrams matches the HOF wordNgrams exactly: dups, order, spaces, unicode, NULL") {
    graft.functions.WordNgrams.register(spark)
    val texts = Seq(
      "", " ", "  ", "a", "a b", "a b c", "a b c d e",
      "a b a b a", "same same same same",
      "  leading and trailing  ", "double  space  tokens",
      "héllo wörld ünd ûnïcode grams", "ρομπότ και άνθρωποι εδώ",
      "日本語 の テキスト 断片 です", "🎉 emoji 🎉 tokens 🎉 here",
      null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 4, 7)) {
      val out = df.select(TextOps.wordNgramsNative(n).as("native"),
                          TextOps.wordNgrams(col("text"), n).as("hof")).collect()
      out.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
      }
    }
  }

  test("word_ngrams HOF parity holds on 300 randomized strings (spaces, unicode, astral)") {
    graft.functions.WordNgrams.register(spark)
    val rnd = new scala.util.Random(692)
    val alphabet = "ab é日🎉 .x  " // weights spaces heavily; multi-byte + astral
    def randText() = Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val texts = Seq.fill(300)(randText())
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 3, 5)) {
      df.select(TextOps.wordNgramsNative(n).as("native"),
          TextOps.wordNgrams(col("text"), n).as("hof")).collect()
        .foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"n=$n native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
        }
    }
  }

  test("word_ngrams participates in whole-stage codegen and rejects bad arguments") {
    graft.functions.WordNgrams.register(spark)
    // non-literal input so constant folding can't pre-evaluate the call
    val df = spark.range(10).select(concat(lit("a b "), col("id")).as("text"))
      .select(expr("word_ngrams(text, 2)").as("g"))
    assert(df.collect().length == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("word_ngrams") && plan.contains("*(1) Project"), plan)
    intercept[Exception](
      Seq("ab").toDF("text").select(expr("word_ngrams(text)")).collect())
    intercept[Exception](
      Seq(("ab", 2)).toDF("text", "n").select(expr("word_ngrams(text, n)")).collect())
    intercept[Exception](
      Seq(1L).toDF("text").select(expr("word_ngrams(text, 2)")).collect())
  }
}

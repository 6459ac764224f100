package graft

import org.apache.spark.sql.DataFrame

import graft.text.{Dedup, TextOps}

/** Randomized brute-force parity for BOTH exact Jaccard join paths —
  * PPJoin (prefix-filtered inverted index) and bitmap (AND+POPCNT) — over
  * word sets and char-3-gram sets. The brute force is plain Scala over
  * the same tokenization, so any filter (prefix, positional, length) that
  * wrongly drops a candidate, or any bitmap packing bug, shows up as a
  * missing/extra pair. */
class JaccardPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa")

  private def randomCorpus(nDocs: Int): Seq[(Long, String)] =
    (0 until nDocs).map { i =>
      val len = 1 + rng.nextInt(12)
      val words = Seq.fill(len)(vocab(rng.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }

  private def wordSet(text: String): Set[String] = text.split(" ").toSet

  private def gramSet(text: String): Set[String] =
    if (text.length < 3) Set.empty
    else (0 to text.length - 3).map(i => text.substring(i, i + 3)).toSet

  private def brute(corpus: Seq[(Long, String)], num: Int, den: Int,
                    setOf: String => Set[String]): Set[(Long, Long, Long, Long)] =
    (for {
      (ida, ta) <- corpus; (idb, tb) <- corpus if ida < idb
      sa = setOf(ta); sb = setOf(tb)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * den >= union * num
    } yield (ida, idb, inter, union)).toSet

  private def collectPairs(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("PPJoin and bitmap paths match brute force on 12 random corpora × thresholds") {
    val thresholds = Seq((1, 2), (2, 3), (4, 5), (19, 20), (1, 1))
    for (trial <- 1 to 12) {
      val corpus = randomCorpus(8 + rng.nextInt(8))
      val df = corpus.toDF("doc_id", "text")
      val (num, den) = thresholds(trial % thresholds.length)
      val expectW = brute(corpus, num, den, wordSet)
      assert(collectPairs(Dedup.jaccardPairs(df, num, den)) == expectW,
        s"trial $trial PPJoin words num=$num den=$den corpus=$corpus")
      assert(collectPairs(Dedup.jaccardPairsBitmap(df, num, den)) == expectW,
        s"trial $trial bitmap words num=$num den=$den corpus=$corpus")
      // blocked composition: identical output for every salt count,
      // including the num = den equality band (no upward probes)
      assert(collectPairs(Dedup.jaccardPairsBitmapBlocked(df, num, den,
        salts = 1 + trial % 4)) == expectW,
        s"trial $trial banded bitmap words num=$num den=$den corpus=$corpus")
      if (trial % 3 == 0) { // char-gram extractor parity on a subset of trials
        val expectG = brute(corpus, num, den, gramSet)
        assert(collectPairs(Dedup.jaccardPairs(df, num, den,
          tokensOf = TextOps.charGrams3)) == expectG,
          s"trial $trial PPJoin grams num=$num den=$den corpus=$corpus")
        assert(collectPairs(Dedup.jaccardPairsBitmap(df, num, den,
          tokensOf = TextOps.charGrams3)) == expectG,
          s"trial $trial bitmap grams num=$num den=$den corpus=$corpus")
        assert(collectPairs(Dedup.jaccardPairsBitmapBlocked(df, num, den,
          tokensOf = TextOps.charGrams3Native, salts = 1 + trial % 3)) == expectG,
          s"trial $trial banded native grams num=$num den=$den corpus=$corpus")
      }
    }
  }
}

package graft

import graft.text.Dedup

/** Asymmetric set-containment join (q74): the quote/subset relation —
  * planted inclusions Jaccard misses, brute-force parity, ordered-pair
  * semantics, and the shuffled-degrade mode. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // brute-force ordered containment pairs on distinct word sets
  private def brute(rows: Seq[(Long, String)], num: Int, den: Int) = {
    val sets = rows.map { case (id, tx) => id -> tx.split(" ", -1).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      inter = (sa & sb).size
      if inter.toLong * den >= sa.size.toLong * num
    } yield (ia, ib, inter.toLong, sa.size.toLong)).toSet
  }

  test("a short doc pasted into a long one: containment catches it, Jaccard cannot") {
    val docs = docsDF(
      1L -> "quoted passage about spark shuffles",
      2L -> "a very long document with many extra words that includes the quoted passage about spark shuffles and continues on and on with more words",
      3L -> "entirely different content here")
    val pairs = Dedup.containmentPairs(docs, num = 1, den = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(1L -> 2L), s"got $pairs") // ordered: 1 ⊆ 2 only
    // Jaccard at the same pair: 5 shared / 25 union — far below any
    // dedup threshold; the asymmetric relation is the only one that fires
    val jac = Dedup.jaccardPairs(docs, num = 1, den = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains(1L -> 2L))
  }

  test("mutual containment (equal sets) emits BOTH ordered pairs") {
    val docs = docsDF(1L -> "a b c", 2L -> "c b a a", 3L -> "a b")
    val pairs = Dedup.containmentPairs(docs, num = 1, den = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sets: {a,b,c}, {a,b,c}, {a,b}: 1↔2 mutual, 3 ⊆ 1 and 3 ⊆ 2
    assert(pairs == Set(1L -> 2L, 2L -> 1L, 3L -> 1L, 3L -> 2L))
  }

  test("matches brute force on a random corpus, broadcast and shuffled verify") {
    val rnd = new scala.util.Random(74)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = (1L to 80L).map { i =>
      i -> Seq.fill(2 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val expected = brute(rows, 4, 5)
    for (bcast <- Seq(true, false)) {
      val got = Dedup.containmentPairs(docsDF(rows: _*), num = 4, den = 5,
          broadcastVerify = bcast)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"broadcastVerify=$bcast")
    }
  }

  test("bitmap form is identical to the PPJoin form across thresholds and salt counts") {
    val rnd = new scala.util.Random(740)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    // include short docs and long docs so probes span several size bands
    val rows = (1L to 120L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs = docsDF(rows: _*)
    for ((num, den) <- Seq((1, 1), (4, 5), (49, 50)); salts <- Seq(1, 4)) {
      val expected = brute(rows, num, den)
      val got = Dedup.containmentPairsBitmap(docs, num, den, salts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected, s"num=$num den=$den salts=$salts")
    }
  }

  test("blockCol restricts pairs to the block; NULL-block docs pair with nothing") {
    val rnd = new scala.util.Random(741)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val rows = (1L to 90L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        if (i % 10 == 0) null else s"blk${i % 3}")
    }
    val docs = rows.toDF("doc_id", "text", "blk")
    val blkOf = rows.map(r => r._1 -> r._3).toMap
    val expected = brute(rows.map(r => (r._1, r._2)), 4, 5)
      .filter { case (a, b, _, _) => blkOf(a) != null && blkOf(a) == blkOf(b) }
    val got = Dedup.containmentPairsBitmap(docs, num = 4, den = 5,
        blockCol = Some("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("threshold 0 is rejected (disjoint pairs cannot surface from an index join)") {
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(docsDF(1L -> "a"), num = 0, den = 1))
  }
}

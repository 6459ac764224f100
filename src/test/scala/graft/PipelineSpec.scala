package graft

import graft.text.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("chunking: full coverage with the configured overlap, no redundant trailing chunk") {
    val words = (1 to 50).map(i => s"w$i")
    val d = docs(1L -> words.mkString(" "))
    val chunks = Pipeline.chunk(d, chunkTokens = 20, overlap = 5).collect()
    // starts at 0, 15, 30; the start at 45 would re-emit [w46..w50] which
    // chunk [w31..w50] already fully covers — pure duplicated text, cut
    assert(chunks.map(_.getAs[Long]("n_tokens")).toSeq == Seq(20L, 20L, 20L))
    val texts = chunks.map(_.getAs[String]("chunk_text"))
    assert(texts(0).startsWith("w1 ") && texts(1).startsWith("w16 "))
    // every word appears in at least one chunk even after the cut
    val covered = texts.flatMap(_.split(" ")).toSet
    assert(covered == words.toSet)
    // a trailing chunk that DOES add new tokens is kept (and stays short)
    val words52 = (1 to 52).map(i => s"w$i")
    val chunks52 = Pipeline.chunk(docs(1L -> words52.mkString(" ")), 20, 5).collect()
    assert(chunks52.map(_.getAs[Long]("n_tokens")).toSeq == Seq(20L, 20L, 20L, 7L))
    assert(chunks52.flatMap(_.getAs[String]("chunk_text").split(" ")).toSet == words52.toSet)
  }

  test("chunking: doc shorter than one chunk yields exactly one chunk") {
    val out = Pipeline.chunk(docs(1L -> "a b c"), 32, 8).collect()
    assert(out.length == 1 && out(0).getAs[Long]("n_tokens") == 3)
  }

  test("packing: pack ids are by starting offset, deterministic") {
    val d = docs((1L to 10L).map(i => i -> Seq.fill(100)("t").mkString(" ")): _*)
    val out = Pipeline.pack(d, capacityTokens = 250).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("pack_id"))).toMap
    // starts: 0,100,…,900 → packs 0,0,0,1,1,2,2,2,3,3 (offsets div 250)
    assert(out == (1L to 10L).map(i => i -> ((i - 1) * 100 / 250)).toMap)
  }

  test("packing matches the single-task window form (scale rewrite parity)") {
    val rng = new scala.util.Random(31L)
    val d = docs((1L to 137L).map(i =>
      i -> Seq.fill(1 + rng.nextInt(40))("w").mkString(" ")): _*)
    // oracle: the partitionless-window formulation the operator replaced
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expect = d.select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n"))
      .withColumn("cum", org.apache.spark.sql.functions.sum("n").over(w))
      .selectExpr("doc_id", "CAST((cum - n) div 64 AS BIGINT) AS pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = Pipeline.pack(d, capacityTokens = 64).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("pack_id"))).toMap
    assert(got == expect)
    // and the operator's plan must NOT contain a window at all
    val plan = Pipeline.pack(d, 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"pack still plans a window:\n$plan")
  }

  test("normalize strips punctuation, collapses space, flags changes") {
    val out = Pipeline.normalize(docs(1L -> "Hello,  World!", 2L -> "already clean"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
    assert(out(1L) == (("hello world", true)))
    assert(out(2L) == (("already clean", false)))
  }

  test("dataset split: stable under doc_id renumbering, all buckets hit") {
    val texts = (1 to 200).map(i => s"document number $i with content")
    val a = Pipeline.datasetSplit(docs(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*))
      .collect().map(r => r.getAs[Long]("bucket"))
    val b = Pipeline.datasetSplit(docs(texts.zipWithIndex.map { case (t, i) => (i + 1000L, t) }: _*))
      .collect().map(r => r.getAs[Long]("bucket"))
    assert(a.sameElements(b), "split must depend on content, not ids")
    assert(a.toSet.size == 10, s"expected all 10 buckets, got ${a.toSet}")
  }

  test("redactPii replaces emails and phones with placeholders and counts them") {
    val d = docs(
      1L -> "contact bob.smith+x@example.co.uk or 555-123-4567 today",
      2L -> "no pii here at all",
      3L -> "two mails a@b.io c@d.org and 800.555.1234")
    val out = Pipeline.redactPii(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "contact <EMAIL> or <PHONE> today")), s"got ${out(1L)}")
    assert(out(2L) == ((0L, 0L, "no pii here at all")))
    assert(out(3L) == ((2L, 1L, "two mails <EMAIL> <EMAIL> and <PHONE>")), s"got ${out(3L)}")
    // counts reconcile with placeholders: a phone-shaped substring INSIDE
    // an email is consumed by the email pass and must not count as a phone
    val tricky = Pipeline.redactPii(docs(9L -> "mail x@555-123-4567.com please")).collect()(0)
    assert(tricky.getLong(1) == 1L && tricky.getLong(2) == 0L &&
      tricky.getString(3) == "mail <EMAIL> please",
      s"got ${(tricky.getLong(1), tricky.getLong(2), tricky.getString(3))}")
  }

  test("mixture: budgeted per-source fractions, small sources taken whole, unweighted drop") {
    // srcA: 40 tokens over 8 docs; srcB: 10 tokens over 2 docs; srcC unweighted
    val corpus = ((1L to 8L).map(i => (i, "w1 w2 w3 w4 w5", "srcA")) ++
      Seq((20L, "x1 x2 x3 x4 x5", "srcB"), (21L, "y1 y2 y3 y4 y5", "srcB"),
          (30L, "z1 z2", "srcC")))
      .toDF("doc_id", "text", "source")
    // budget 30, weights 1:2 → srcA target 10/40 (num=250000),
    // srcB target 20/10 > avail → capped: srcB is taken WHOLE
    val out = Pipeline.mixture(corpus, Map("srcA" -> 1L, "srcB" -> 2L), budgetTokens = 30L)
      .collect().map(r => r.getLong(0)).toSeq.sorted
    assert(out.contains(20L) && out.contains(21L), s"srcB must be kept whole: $out")
    assert(!out.contains(30L), s"unweighted srcC must drop: $out")
    val aKept = out.count(_ <= 8L)
    assert(aKept < 8, s"srcA must be subsampled, kept $aKept of 8")
    // deterministic under repartition (the seeded-RNG failure mode)
    val again = Pipeline.mixture(corpus.repartition(7), Map("srcA" -> 1L, "srcB" -> 2L), 30L)
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(again == out)
    // zero budget keeps nothing; weights covering no present source keep nothing
    assert(Pipeline.mixture(corpus, Map("srcA" -> 1L), 0L).count() == 0L)
    assert(Pipeline.mixture(corpus, Map("nope" -> 1L), 100L).count() == 0L)
  }

  test("upsample: whole + fractional epochs, pass-through default, deterministic") {
    val corpus = ((1L to 20L).map(i => (i, s"doc $i text", "hot")) ++
      Seq((50L, "cold one", "cold"))).toDF("doc_id", "text", "source")
    val out = Pipeline.upsample(corpus, Map("hot" -> (5, 2))) // 2.5 epochs
      .collect().map(r => (r.getLong(0), r.getAs[Long]("epoch")))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // every hot doc appears 2 or 3 times with dense 0-based epochs
    (1L to 20L).foreach { i =>
      assert(Seq(Seq(0L, 1L), Seq(0L, 1L, 2L)).contains(byDoc(i)), s"doc $i: ${byDoc(i)}")
    }
    val hotCopies = out.count(_._1 <= 20L)
    assert(hotCopies > 40 && hotCopies < 60, s"~2.5x expected, got $hotCopies/20 docs")
    assert(byDoc(50L) == Seq(0L), "unlisted source passes through at one epoch")
    // fractional-epoch membership is the Sampling key-hash rule: stable
    val again = Pipeline.upsample(corpus.repartition(5), Map("hot" -> (5, 2)))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("epoch")))
    assert(again.sorted.toSeq == out.sorted.toSeq)
    // a 0/1 target drops the source entirely for non-matching hash rows
    val half = Pipeline.upsample(corpus, Map("hot" -> (1, 2)))
      .collect().map(_.getLong(0)).filter(_ <= 20L)
    assert(half.length < 20 && half.nonEmpty, s"~half expected, got ${half.length}")
    // the fractional epoch uses a SALTED hash: chaining byKeyHash(1/2) with
    // upsample(5/2) on the same key must NOT give every survivor the same
    // epoch count (the unsalted form correlates perfectly and biases the
    // realized multiple from 2.5 to 3.0)
    val sampled = graft.operators.Sampling.byKeyHash(corpus, Seq("doc_id"), 1, 2)
    val perDoc = Pipeline.upsample(sampled, Map("hot" -> (5, 2)))
      .collect().filter(_.getString(2) == "hot")
      .groupBy(_.getLong(0)).view.mapValues(_.length).values.toSeq
    assert(perDoc.toSet == Set(2, 3),
      s"survivors must mix 2- and 3-epoch docs, got counts $perDoc")
    // an input already carrying an epoch column is rejected, not overwritten
    intercept[IllegalArgumentException] {
      Pipeline.upsample(Pipeline.upsample(corpus, Map("hot" -> (2, 1))), Map("hot" -> (2, 1)))
    }
  }

  test("decontaminate drops blocklisted content AND its duplicates, by content not id") {
    val corpus = docs(
      1L -> "the eval question about physics",
      2L -> "a perfectly clean training doc",
      3L -> "physics about question eval the", // word-bag dup of the eval doc
      4L -> "another clean one")
    val block = docs(100L -> "the eval question about physics") // different id, same content
    val kept = Pipeline.decontaminate(corpus, block).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(2L, 4L), s"kept=$kept")
    // empty blocklist keeps everything
    val all = Pipeline.decontaminate(corpus, block.filter("doc_id < 0"))
      .collect().map(_.getLong(0)).toSeq
    assert(all == Seq(1L, 2L, 3L, 4L))
  }

  test("contaminationEstimate: identical source reads 1000 permille EXACTLY, disjoint reads 0") {
    // 'dirty' source == the blocklist verbatim (sketch equality makes
    // jacc == 1 and union == bench, so cont_permille is EXACTLY 1000 —
    // floor(1000·1·x/x)); 'clean' shares no 4-gram (disjoint vocab), so
    // matches == 0 and every overlap read is exactly 0
    val dirty = (0L until 30L).map(i =>
      (i * 17L, s"eval question $i with secret answer token$i appended", "dirty"))
    val clean = (1L to 30L).map(i =>
      (i * 17L + 1L, s"unrelated corpus prose number$i about weather day$i", "clean"))
    val corpus = (dirty ++ clean).toDF("doc_id", "text", "source")
    val block = corpus.filter($"doc_id" % 17 === 0) // exactly the dirty docs
    val got = Pipeline.contaminationEstimate(corpus, block, n = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(6), r.getLong(7))).toMap
    val (cM, _, cInter, cCont) = got("clean")
    assert((cM, cInter, cCont) == ((0L, 0L, 0L)), s"clean=$got")
    val (dM, dH, dInter, dCont) = got("dirty")
    assert(dM == dH, "identical sketches must agree on every hit register")
    assert(dCont == 1000L, s"dirty cont=$dCont")
    // the intersection estimate is the union estimate here; sanity-band
    // it around the true distinct-gram count (30 docs x 5 grams = 150)
    assert(math.abs(dInter - 150L) <= 60L, s"dirty inter=$dInter")
  }

  test("upsample bounds the TRUE copy ratio, not its integer division") {
    val corpus = Seq((1L, "t", "hot")).toDF("doc_id", "text", "source")
    // 2001/2 = 1000 by integer division but up to 1001 realized copies
    intercept[IllegalArgumentException] {
      Pipeline.upsample(corpus, Map("hot" -> (2001, 2)))
    }
    // exactly at the bound is fine
    assert(Pipeline.upsample(corpus, Map("hot" -> (2000, 2))).count() == 1000L)
  }
}

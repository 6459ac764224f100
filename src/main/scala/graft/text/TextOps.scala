package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-pipeline primitives shared by the dedup / analysis operators.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * or native higher-order-function expressions — no UDFs — so Catalyst can
  * push filters below them and the hot path stays in Tungsten.
  *
  * Determinism contract: [[xhash]] is `md5 → first 15 hex digits → int`,
  * which DuckDB reproduces verbatim as
  * `('0x' || substr(md5(s),1,15))::BIGINT` — the basis for every
  * hash-checkable oracle over text (MinHash, SimHash, fingerprints).
  */
object TextOps {

  /** Large prime modulus for all hashing arithmetic (fits products of two
    * residues in a 63-bit signed long: (P-1)^2 < 2^60). */
  val P: Long = 1000000007L

  /** Cross-engine deterministic 60-bit string hash. */
  def xhash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-gram shingles; docs with < 3 tokens yield none.
    * (`sequence(0, size-3)` would count DOWN for size < 3 — hence the guard
    * via `filter` at call sites or the `case when` here.) */
  val shinglesExpr: String =
    """CASE WHEN size(ws) >= 3 THEN
      |  array_distinct(transform(sequence(0, size(ws)-3),
      |    i -> concat_ws(' ', element_at(ws,i+1), element_at(ws,i+2), element_at(ws,i+3))))
      |ELSE array() END""".stripMargin
}

/** Deduplication operators over a `(doc_id, text)` corpus.
  *
  * Scale design (the part that must survive 100 TB):
  *  - exact dedup is a hash `groupBy` on the fingerprint — one shuffle,
  *    map-side partial aggregation, no skew beyond genuine duplicate mass;
  *  - MinHash/LSH never forms all pairs: candidates come from a
  *    `groupBy(band, bandSignature)` bucket join (shuffle keyed on the band
  *    signature), so cost is O(sum of bucket sizes squared) ≈ O(dup mass),
  *    not O(n²);
  *  - clustering is iterative min-label propagation over the candidate-pair
  *    edge list (standard large-scale connected components), each round one
  *    self-join + groupBy on a skew-free key.
  */
object Dedup {
  import TextOps._

  /** Exact duplicate groups on a normalized fingerprint (sorted distinct
    * word set). Output: (rep_doc, dup_cnt) — one row per group,
    * representative = min doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        array_join(array_sort(array_distinct(split(col("text"), " "))), " ").as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("rep_doc"), count(lit(1)).as("dup_cnt"))
      .select("rep_doc", "dup_cnt")
      .orderBy("rep_doc")

  /** Per-(i, doc) MinHash over distinct word 3-gram shingles:
    * `min over shingles of (a_i·h(s) + b_i) mod P` with
    * `a_i = 2654435761·(i+1) mod P`, `b_i = 40503·(i+1) mod P`.
    * Long-form output (doc_id, i, minhash) — cross-engine checkable. */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val spark = docs.sparkSession
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(shinglesExpr)).as("s"))
    val hashed = sh.select(col("doc_id"), (xhash(col("s")) % P).as("h"))
    val hfns = spark.range(numHashes).select(
      col("id").as("i"),
      ((lit(2654435761L) * (col("id") + 1)) % P).as("a"),
      ((lit(40503L) * (col("id") + 1)) % P).as("b"))
    hashed.crossJoin(broadcast(hfns))
      .groupBy("doc_id", "i")
      .agg(min((col("a") * col("h") + col("b")) % P).as("minhash"))
      .orderBy("doc_id", "i")
  }

  /** LSH banding: group the signature into `bands` bands of `rowsPerBand`
    * hashes, bucket docs by (band, concatenated band signature), and emit
    * candidate pairs (doc_a < doc_b) per shared bucket, deduplicated.
    * Never all-pairs: the only shuffle keys are band signatures. */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // collect_list order is nondeterministic — sort the (i, minhash) structs
    // before concatenating so the band signature is deterministic
    val bsig = signatures
      .withColumn("band", (col("i") / rowsPerBand).cast(IntegerType))
      .groupBy("doc_id", "band")
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("minhash")))),
        s => s.getField("minhash")), ",").as("bsig"))
    bsig.as("a").join(bsig.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact set-similarity join on distinct word sets via an inverted-index
    * join (no cartesian product): pairs sharing >= threshold Jaccard,
    * expressed as integers `denNum*inter >= num*union` to stay exact.
    * Output: (doc_a, doc_b, inter_cnt, union_cnt). */
  def jaccardPairs(docs: DataFrame, num: Int, den: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val shared = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
    shared
      .join(broadcast(sizes).as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
        (col("sa.nw") + col("sb.nw") - col("inter_cnt")).as("union_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
      .orderBy("doc_a", "doc_b")
  }

  /** Connected components over an undirected edge list (doc_a, doc_b) by
    * iterative min-label propagation; returns (doc_id, cluster) where
    * cluster = min doc_id reachable. Rounds are O(diameter); each round is
    * one groupBy — the standard scalable CC formulation. */
  def clusters(allDocs: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = allDocs.sparkSession
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = allDocs.select(col("doc_id"), col("doc_id").as("cluster"))
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val neighborMin = sym.join(labels, sym("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id")).agg(min("cluster").as("nmin"))
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"), least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
        .cache()
      val diff = next.as("n").join(labels.as("o"), Seq("doc_id"))
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count()
      changed = diff > 0
      labels = next
      iter += 1
    }
    labels.orderBy("doc_id")
  }
}

/** SimHash document fingerprinting: each distinct token votes ±1 on `bits`
  * bit positions of its hash; the fingerprint sets bit b iff the vote sum
  * is positive. Near-duplicate docs land at small Hamming distance. */
object SimHash {
  import TextOps._

  def fingerprints(docs: DataFrame, bits: Int): DataFrame = {
    val spark = docs.sparkSession
    val tok = docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .select(col("doc_id"), xhash(col("w")).as("h"))
    tok.crossJoin(broadcast(spark.range(bits).select(col("id").as("b"))))
      .select(col("doc_id"), col("b"),
        when((expr("shiftright(h, CAST(b AS INT))") bitwiseAND lit(1L)) === 1, lit(1L))
          .otherwise(lit(-1L)).as("contrib"))
      .groupBy("doc_id", "b").agg(sum("contrib").as("sb"))
      .groupBy("doc_id")
      .agg(sum(when(col("sb") > 0, expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))
        .otherwise(lit(0L))).as("simhash"))
      .orderBy("doc_id")
  }
}

/** Per-document text analysis: language-ID scoring, quality scoring, token
  * counting, rolling-hash fingerprinting. All integer-exact (ratios are
  * scaled by 1000 and floor-divided) so oracles hash-match. */
object TextAnalysis {
  import TextOps._

  /** Marker-dictionary language scorer. The oracle-facing form scores one
    * dictionary (English function words) and thresholds; [[langIdArgmax]]
    * below generalizes to many languages. Output:
    * (doc_id, en_cnt, n_tokens, score1000, pred). */
  def langIdEnglish(docs: DataFrame, markers: Seq[String], threshold1000: Int): DataFrame = {
    val inList = markers.map(m => s"w = '$m'").mkString(" OR ")
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        expr(s"CAST(size(filter(ws, w -> $inList)) AS BIGINT)").as("en_cnt"),
        expr("CAST(size(ws) AS BIGINT)").as("n_tokens"))
      .withColumn("score1000", expr("CAST(en_cnt * 1000 div n_tokens AS BIGINT)"))
      .withColumn("pred", when(col("score1000") >= threshold1000, lit("en")).otherwise(lit("unk")))
      .orderBy("doc_id")
  }

  /** Multi-language argmax over marker dictionaries (library form; tested
    * in sbt, not oracle-bound: argmax over maps is awkward in portable SQL). */
  def langIdArgmax(docs: DataFrame, dicts: Map[String, Seq[String]]): DataFrame = {
    val scored = dicts.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val inList = markers.map(m => s"w = '$m'").mkString(" OR ")
      struct(expr(s"size(filter(ws, w -> $inList))").as("cnt"), lit(lang).as("lang"))
    }
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        greatest(scored: _*).getField("lang").as("pred_lang"),
        greatest(scored: _*).getField("cnt").cast(LongType).as("marker_cnt"))
      .orderBy("doc_id")
  }

  /** Quality score: type-token ratio, average word length, stopword ratio —
    * integer-scaled ×1000, combined as (2·ttr + (1000 − stop)) div 3. */
  def quality(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val inList = stopwords.map(m => s"w = '$m'").mkString(" OR ")
    docs.select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        expr("CAST(size(ws) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(array_distinct(ws)) AS BIGINT)").as("n_distinct"),
        expr("CAST(length(text) AS BIGINT)").as("n_chars"),
        expr(s"CAST(size(filter(ws, w -> $inList)) AS BIGINT)").as("stop_cnt"))
      .withColumn("ttr1000", expr("CAST(n_distinct * 1000 div n_tokens AS BIGINT)"))
      .withColumn("awl1000", expr("CAST((n_chars - n_tokens + 1) * 1000 div n_tokens AS BIGINT)"))
      .withColumn("stop1000", expr("CAST(stop_cnt * 1000 div n_tokens AS BIGINT)"))
      .withColumn("quality", expr("CAST((2 * ttr1000 + (1000 - stop1000)) div 3 AS BIGINT)"))
      .orderBy("doc_id")
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (`[a-z]+|[0-9]+|[^a-z0-9 ]` — word pieces, number pieces, punct). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("ws_tokens"),
        expr("CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS BIGINT)").as("re_tokens"))
      .orderBy("doc_id")

  /** Order-sensitive rolling polynomial fingerprint over token hashes:
    * fold(acc·131 + h(w)) mod P. Reorderings change the fingerprint
    * (unlike the bag-of-words fingerprint in [[Dedup.exact]]). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr(s"""aggregate(
          transform(split(text, ' '),
            w -> CAST(conv(substring(md5(w),1,15),16,10) AS BIGINT) % $P),
          CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % $P)""").as("fp"))
      .orderBy("doc_id")
}

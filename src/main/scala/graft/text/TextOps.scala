package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.chaining._

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

  /** Spread an UNDER-SPLIT corpus scan across the session's cores before
    * CPU-dense per-row work (r15 optimization round; guide §2.5 "input
    * skew: one huge unsplittable file — repartition immediately after
    * the read"): a small corpus parquet is ONE split, so the gram
    * explosion / md5 hashing of every text operator ran in ONE task
    * (measured 6.7 s single-task on the q244 sketch build). When the
    * frame's scan parallelism is below the session default, hash-
    * repartition by `key` to the default — a few MB of text moved once;
    * at scale the scan already has ≥ cores splits and this is a NO-OP
    * (never repartitions a big corpus). Call only on scan-rooted frames
    * (no exchanges upstream — `.rdd` here must not trigger stages). */
  private[graft] def spreadScan(df: DataFrame, key: String = "doc_id"): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want, col(key)) else df
  }

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

  /** Distinct character 3-grams of `text` — the n-gram-Jaccard dedup unit
    * (robust to tokenization differences, unlike word sets). Guarded: a
    * text under 3 chars yields an empty set, and `sequence` never counts
    * down. */
  val charGrams3: Column = expr(
    """CASE WHEN length(text) >= 3 THEN
      |  array_distinct(transform(sequence(1, length(text) - 2),
      |    i -> substring(text, i, 3)))
      |ELSE array() END""".stripMargin)

  /** Native twin of [[charGrams3]] ([[graft.functions.CharNGrams]], parity
    * spec-gated): one codegen'd pass per row vs ~|text| interpreted lambda
    * dispatches — the difference between the tokenize stage dominating the
    * char-gram Jaccard join and disappearing into it. Requires
    * `CharNGrams.register` on the session (the Dedup operators register it
    * themselves; raw `select`s must call it first). */
  val charGrams3Native: Column = expr("char_ngrams(text, 3)")

  /** ALL word n-grams of `text` in document order (duplicates kept —
    * unlike [[shinglesExpr]], which is the distinct-set dedup unit): the
    * span inventory for overlap-decontamination and duplicated-span
    * statistics. Guarded like the other gram builders: under n tokens
    * yields an empty array (`sequence` counts DOWN for size < n, which
    * would throw on a negative-length slice). */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = split(text, " ")
    when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n),
          i => array_join(slice(ws, i + lit(1), lit(n)), " ")))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
  }

  /** Native twin of [[wordNgrams]] over the column literally named `text`
    * ([[graft.functions.WordNgrams]], parity spec-gated): one zero-copy
    * byte pass per row vs ~|tokens| interpreted slice+join lambdas — the
    * tokenize stage of the n-gram hygiene operators (q69/q70) by a wide
    * margin. Requires `WordNgrams.register` on the session (the operators
    * register it themselves; raw `select`s must call it first). */
  def wordNgramsNative(n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    expr(s"word_ngrams(text, $n)")
  }
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
    * representative = min doc_id.
    *
    * Default is BYTE-EXACT (the full fingerprint is the groupBy key) — the
    * semantics the name promises. The scale path is [[exactHashed]]: the
    * key becomes a 124-bit pair of independent hashes of the fingerprint
    * (xxhash64 + the md5-based [[TextOps.xhash]]) — 16 bytes per shuffle
    * row instead of the whole document. A false merge needs a simultaneous
    * collision in both — P < 10^-18 even at 10^12 docs (birthday bound) —
    * but it IS probabilistic, so callers opt in explicitly at the call
    * site rather than getting it silently (parity is spec-tested). */
  def exact(docs: DataFrame, verifyExact: Boolean = true): DataFrame =
    fingerprintGroups(docs, Seq.empty, verifyExact)
      .agg(min("doc_id").as("rep_doc"), count(lit(1)).as("dup_cnt"))
      .select("rep_doc", "dup_cnt")
      .orderBy("rep_doc")

  /** The ONE definition of the exact-dedup grouping shared by [[exact]]
    * and [[exactBest]] (their DuckDB mirrors replicate it, so it must not
    * fork): normalized fingerprint = sorted distinct word set; group key =
    * the fingerprint itself, or its 16-byte (xxhash64, xhash) pair on the
    * hashed scale path. `carry` columns ride along un-grouped. */
  private def fingerprintGroups(docs: DataFrame, carry: Seq[Column],
                                verifyExact: Boolean) = {
    val fp = docs.select(col("doc_id") +: carry :+
      array_join(array_sort(array_distinct(split(col("text"), " "))), " ").as("fp"): _*)
    if (verifyExact) fp.groupBy("fp")
    else fp.select(col("doc_id") +: carry :+
        xxhash64(col("fp")).as("fph1") :+ xhash(col("fp")).as("fph2"): _*)
      .groupBy("fph1", "fph2")
  }

  /** The 100 TB form of [[exact]]: group on a 16-byte hash pair of the
    * fingerprint instead of the fingerprint itself, so the shuffle moves
    * 16 bytes/row, not the corpus. Negligibly probabilistic (see [[exact]]
    * scaladoc); named separately so call sites state the trade explicitly. */
  def exactHashed(docs: DataFrame): DataFrame = exact(docs, verifyExact = false)

  /** [[exact]] with a SURVIVOR POLICY: the representative of each
    * duplicate group is the member with the highest `scoreCol`
    * (tie → smallest doc_id), not the smallest doc_id. This is the form a
    * real corpus pipeline wants once a quality signal exists — when near-
    * identical docs differ in boilerplate or truncation, "keep the
    * best-scored copy" beats "keep the oldest id" (the FineWeb/RefinedWeb
    * keep-one choice is exactly this argmax). Output:
    * (rep_doc, best_score, dup_cnt), ordered by rep_doc.
    *
    * Same plan shape as [[exact]]: one hash aggregation with map-side
    * partial `max_by` — the score rides the 16-byte hashed key path
    * ([[exactHashed]]'s trade, opt-in via `verifyExact = false`), no
    * window, no second pass. NULL scores sort below every non-NULL score
    * (group members with NULL score lose to any scored member; an all-NULL
    * group keeps its smallest doc_id, best_score NULL). */
  def exactBest(docs: DataFrame, scoreCol: String,
                verifyExact: Boolean = true): DataFrame = {
    require(!docs.columns.contains("__score"),
      "input already has a '__score' column")
    // max_by over (score, -doc_id): highest score wins, ties to the
    // smallest id. NULL-score rows: struct comparison puts NULL lowest,
    // matching the scaladoc contract.
    fingerprintGroups(docs.withColumn("__score", col(scoreCol).cast(LongType)),
        Seq(col("__score")), verifyExact)
      .agg(max_by(col("doc_id"), struct(col("__score"), (-col("doc_id")).as("nid")))
          .as("rep_doc"),
        max("__score").as("best_score"),
        count(lit(1)).as("dup_cnt"))
      .select("rep_doc", "best_score", "dup_cnt")
      .orderBy("rep_doc")
  }

  /** Per-(i, doc) MinHash over distinct word 3-gram shingles:
    * `min over shingles of (a_i·h(s) + b_i) mod P` with
    * `a_i = 2654435761·(i+1) mod P`, `b_i = 40503·(i+1) mod P`.
    * Long-form output (doc_id, i, minhash) — cross-engine checkable.
    *
    * Fully NARROW: each doc's whole signature is one higher-order-function
    * expression (shingle hashes computed once, then `array_min` per hash
    * function) — no explode, no shuffle, embarrassingly parallel. The
    * round-1-style explode + crossJoin + groupBy form shuffled
    * O(docs·shingles·hashes) skinny rows for the same numbers. */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    // sequence(0, numHashes-1) COUNTS DOWN for numHashes <= 0 (the same
    // foot-gun shinglesExpr guards) — reject rather than emit garbage rows
    require(numHashes >= 1, "need numHashes >= 1")
    // one native k·|shingles| loop ([[graft.functions.MinhashAffine]],
    // HOF-parity spec-gated) — the transform×array_min HOF form dispatched
    // k·|shingles| interpreted lambdas per row and dominated this stage
    graft.functions.MinhashAffine.register(docs.sparkSession)
    val sigExpr = s"minhash_affine(hs, $numHashes, ${P}L)"
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(shinglesExpr).as("sh"))
      .select(col("doc_id"),
        expr(s"transform(sh, s -> CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT) % $P)").as("hs"))
      .select(col("doc_id"), posexplode(expr(sigExpr)))
      .select(col("doc_id"), col("pos").cast(LongType).as("i"), col("col").as("minhash"))
      .orderBy("doc_id", "i")
  }

  /** LSH banding: group the signature into `bands` bands of `rowsPerBand`
    * hashes, bucket docs by (band, concatenated band signature), and emit
    * candidate pairs (doc_a < doc_b) per shared bucket, deduplicated.
    * Never all-pairs: the only shuffle keys are band signatures.
    * Uses the FIRST bands·rowsPerBand hashes of the signature — extra
    * hashes are ignored (and `bands` is honored: asking for fewer bands
    * than the signature could fill lowers recall/cost, it doesn't
    * silently re-derive banding from the signature width). */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1, "need bands >= 1 and rowsPerBand >= 1")
    val bsig = bandSignatures(signatures, bands, rowsPerBand)
    bsig.as("a").join(bsig.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Shared band-signature build for [[lshCandidatePairs]] and
    * [[dedupDelta]]: (doc_id, band, bsig) with bsig the comma-joined
    * minhashes of the band in i order. collect_list order is
    * nondeterministic — the (i, minhash) structs are sorted before
    * concatenating so the band signature is deterministic. */
  private def bandSignatures(signatures: DataFrame, bands: Int,
                             rowsPerBand: Int): DataFrame = signatures
    .withColumn("band", (col("i") / rowsPerBand).cast(IntegerType))
    .filter(col("band") < bands)
    .groupBy("doc_id", "band")
    .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("minhash")))),
      s => s.getField("minhash")), ",").as("bsig"))

  /** INCREMENTAL near-dedup — the warm-start contract for the dedup
    * family: flag which docs of a NEW batch near-duplicate an EXISTING
    * corpus, touching only the corpus's STORED MinHash signatures
    * ([[minhashSignatures]] long form, the artifact a daily-ingest
    * pipeline persists) — the corpus text is never re-read, corpus ×
    * corpus pairs are never re-examined, and the work is bounded by the
    * delta's LSH bucket collisions, not the corpus size.
    *
    * Contract (fully deterministic, oracle-replayable): a delta doc `d`
    * matches doc `m` iff (a) they share at least one LSH band (`bands` ×
    * `rowsPerBand` over the first hashes) and (b) their signatures agree
    * on ≥ num/den of all `numHashes` positions (cross-multiplied —
    * `agree·den ≥ num·numHashes` — the unbiased MinHash Jaccard
    * estimator, computable from signatures alone). `m` ranges over the
    * corpus AND over delta docs with a smaller doc_id (the new batch is
    * deduped against itself too, earliest-id-wins). Output: one row per
    * delta doc carrying a signature — (doc_id, dup_of) with dup_of =
    * the SMALLEST matching doc id, NULL for survivors. dup_of is a
    * MATCH, not a transitive cluster representative — feed the flagged
    * pairs to [[clusters]] when families must be closed.
    *
    * `checkDisjoint` runs one distinct-id semi-join and RAISES if the
    * two sides share a doc id (one id on both sides has no right
    * answer). It costs a corpus-wide distinct scan — disable it when
    * ids are disjoint by construction (time-ordered ingest ids).
    *
    * Scale shape: band build is one map-side-combined agg per side; the
    * candidate joins are keyed on (band, bsig) with the DELTA side
    * always the small probe; the agreement verify joins candidates to
    * the signature tables on (doc, i) — O(candidates · numHashes) rows,
    * LSH-bounded. No shuffle touches corpus text. */
  def dedupDelta(corpusSigs: DataFrame, deltaSigs: DataFrame,
                 numHashes: Int, bands: Int, rowsPerBand: Int,
                 num: Int, den: Int,
                 checkDisjoint: Boolean = true): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"banding ($bands x $rowsPerBand) needs more hashes than numHashes=$numHashes")
    require(num >= 1 && den >= num,
      s"agreement threshold num/den must satisfy 1 <= num <= den, got $num/$den")
    Seq(corpusSigs, deltaSigs).foreach { s =>
      Seq("doc_id", "i", "minhash").foreach(c => require(s.columns.contains(c),
        s"signatures must carry (doc_id, i, minhash) — missing '$c'"))
    }
    if (checkDisjoint) {
      val overlap = corpusSigs.select("doc_id").distinct()
        .join(deltaSigs.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .limit(1).collect()
      require(overlap.isEmpty,
        s"dedupDelta: doc_id ${overlap.head.get(0)} appears in BOTH corpus " +
          "and delta signatures — the sides must be disjoint")
    }
    // the delta band table feeds both candidate joins; the delta sig
    // table feeds the verify and the output spine — materialize each once
    val dSig = graft.operators.Checkpoints.checkpoint(
      deltaSigs.select("doc_id", "i", "minhash"))
    val bd = graft.operators.Checkpoints.checkpoint(
      bandSignatures(dSig, bands, rowsPerBand))
    val bc = bandSignatures(corpusSigs, bands, rowsPerBand)
    val candCorpus = bd.as("a").join(bc.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig"))
      .select(col("a.doc_id").as("doc"), col("b.doc_id").as("other"))
    val candDelta = bd.as("a").join(bd.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("b.doc_id") < col("a.doc_id"))
      .select(col("a.doc_id").as("doc"), col("b.doc_id").as("other"))
    val cand = candCorpus.union(candDelta).distinct()
    val sigsAll = corpusSigs.select("doc_id", "i", "minhash").union(dSig)
    val matches = cand
      .join(dSig.as("sa"), col("doc") === col("sa.doc_id"))
      .join(sigsAll.as("sb"),
        col("other") === col("sb.doc_id") && col("sa.i") === col("sb.i"))
      .filter(col("sa.minhash") === col("sb.minhash"))
      .groupBy("doc", "other").agg(count(lit(1)).as("agree"))
      .filter(col("agree") * den >= num.toLong * numHashes)
      .groupBy("doc").agg(min("other").as("dup_of"))
    // bd/dSig stay pinned until the caller's gate-level release (the
    // verifiedPairs convention) — the returned frame still reads them
    dSig.select("doc_id").distinct()
      .join(matches, col("doc_id") === col("doc"), "left")
      .select(col("doc_id"), col("dup_of"))
      .orderBy("doc_id")
  }

  /** Exact set-similarity join on distinct word sets: pairs with Jaccard
    * >= num/den, expressed in integers to stay exact.
    * Output: (doc_a, doc_b, inter_cnt, union_cnt).
    *
    * PPJoin-style PREFIX FILTERING (lossless): order every doc's token set
    * by ascending global frequency; a pair at Jaccard >= t MUST share a
    * token among each doc's first `|d| - ceil(t·|d|) + 1` tokens (if all
    * prefix tokens differed, the overlap couldn't reach t·|d|). Only those
    * prefix tokens enter the inverted-index join, so candidate volume is
    * O(Σ prefix²) instead of O(Σ tokenFreq²) — the difference between ~7M
    * and ~700M joined rows on a small-vocabulary corpus. Candidates are
    * then verified exactly with a sorted-int-array intersection.
    *
    * `tokensOf` is the set extractor (a Column producing array<string>
    * from the input row) — word sets by default; pass
    * [[TextOps.charGrams3]] for character-n-gram Jaccard. The whole
    * PPJoin pipeline (rarity ranks, prefixes, verify) is set-agnostic. */
  def jaccardPairs(docs: DataFrame, num: Int, den: Int,
                   broadcastVerify: Boolean = true,
                   tokensOf: Column = array_distinct(split(col("text"), " "))): DataFrame = {
    // num = 0 ("any pair") is NOT expressible by a prefix-filtered join —
    // disjoint pairs share no prefix token and can never surface; reject
    // the degenerate threshold instead of silently under-returning
    require(num >= 1 && num <= den, "need 1 <= num <= den (Jaccard threshold in (0, 1])")
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    // the advertised native gram extractor must resolve when passed as
    // tokensOf — tokensOf is analyzed inside THIS operator's first select
    graft.functions.CharNGrams.register(docs.sparkSession)
    // broadcast() is a HINT Spark obeys unconditionally — on a corpus whose
    // dictionary / doc-sets tables outgrow executor memory, pass
    // broadcastVerify = false and both joins degrade to shuffled joins
    // (still never all-pairs). Parity between the two modes is spec-tested.
    def hinted(df: DataFrame): DataFrame = if (broadcastVerify) broadcast(df) else df
    val sets = rankedSets(docs, tokensOf, hinted)
    // prefix tokens WITH their 1-based position: |prefix| = |d| - ceil(t·|d|) + 1
    val prefixes = sets.select(col("doc_id"), col("nw"),
        posexplode(expr(s"slice(set, 1, CAST(nw - ((nw * $num + $den - 1) div $den) + 1 AS INT))")))
      .select(col("doc_id"), col("nw"), (col("pos") + 1).as("pp"), col("col").as("tr"))
    // candidate join with PPJoin's length filter (den·min >= num·max) and
    // positional filter (the remaining-suffix upper bound must still allow
    // an overlap of ceil(t/(1+t)·(na+nb)))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.tr") === col("b.tr") && col("a.doc_id") < col("b.doc_id") &&
          col("a.nw") * num <= col("b.nw") * den &&
          col("b.nw") * num <= col("a.nw") * den &&
          (lit(1) + least(col("a.nw") - col("a.pp"), col("b.nw") - col("b.pp"))) * (num + den) >=
            (col("a.nw") + col("b.nw")) * num)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // NOTE no distinct here: a pair can arrive via at most |prefix| shared
    // tokens, and deduplicating AFTER verification shuffles only the
    // survivors (~2 orders of magnitude fewer rows than the candidates)
    // verification: the doc-sets table is corpus-rows × ~set-size ints —
    // orders of magnitude smaller than the candidate set — so by default
    // broadcast it and verify map-side (no shuffle of the candidate
    // stream); broadcastVerify = false switches to shuffled joins.
    val verified = cand
      .join(hinted(sets).as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(hinted(sets).as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        // native two-pointer merge count over the sorted rank arrays —
        // size(array_intersect(...)) allocates a hash set + result array
        // per candidate pair, which dominates at millions of candidates
        expr("sorted_intersect_count(sa.set, sb.set)").as("inter_cnt"),
        col("sa.nw"), col("sb.nw"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
        (col("sa.nw") + col("sb.nw") - col("inter_cnt")).as("union_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
      .distinct()
    verified.orderBy("doc_a", "doc_b")
  }

  /** The rarity-ranked sorted-set table shared by [[jaccardPairs]] and
    * [[containmentPairs]]: each doc's token set as a sorted array of
    * dense global-rarity ranks, plus its size.
    *
    * Global rarity rank over the DICTIONARY. A partitionless
    * row_number() window here is a single-task sort of the whole vocab —
    * fine at thousands of words, a scale-killer at web-corpus billions —
    * so rank distributed: range shuffle + zipWithIndex (GlobalRank).
    * Ranks are dense ints; only their total order matters downstream.
    * (int, not long: the verify step's two-pointer intersect walks int
    * arrays; a >2^31-word dictionary would bump this to LongType.)
    *
    * Eagerly materialized: the table feeds the prefix join AND both
    * verify joins — without this the explode+rank-join+groupBy lineage
    * re-executes under each broadcast (measured ~3 builds per call;
    * q38 composes this under connected components, multiplying it).
    * Released via [[graft.operators.Checkpoints]]. */
  private def rankedSets(docs: DataFrame, tokensOf: Column,
                         hinted: DataFrame => DataFrame): DataFrame = {
    val tok = spreadScan(docs).select(col("doc_id"), explode(tokensOf).as("w"))
    val rank = graft.operators.GlobalRank.withRank(
        tok.groupBy("w").agg(count(lit(1)).as("cnt")),
        numParts = 0, "tr0", col("cnt"), col("w"))
      .select(col("w"), (col("tr0") + 1).cast(IntegerType).as("tr"))
    tok.join(hinted(rank), "w")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("tr"))).as("set"), count(lit(1)).as("nw"))
      .pipe(graft.operators.Checkpoints.checkpoint(_)) // release handle: Checkpoints.release
  }

  /** Exact set-CONTAINMENT join — the ASYMMETRIC dedup relation Jaccard
    * misses: (doc_a, doc_b) pairs where |A∩B| / |A| >= num/den, i.e. doc
    * A's token set is (nearly) contained in doc B's. This is quote /
    * subset / boilerplate-inclusion detection: a short doc pasted inside
    * a long one has low Jaccard (the union is large) but containment ~1.
    * Output: (doc_a, doc_b, inter_cnt, na_cnt), ORDERED pairs — A-in-B
    * and B-in-A are different facts; mutual containment (equal sets)
    * emits both. Integer-exact, so oracle-hashable.
    *
    * Filter derivation (lossless, same family as [[jaccardPairs]]):
    *  - PREFIX on the contained side only: |A∩B| >= ceil(t·|A|) forces a
    *    shared token among A's first |A| - ceil(t·|A|) + 1 rarity-ordered
    *    tokens. B gets NO prefix — containment puts no lower bound on
    *    B's share of the overlap — so the container side is fully
    *    indexed, and candidate volume is O(Σ prefixFreq·freq), not
    *    O(Σ freq²) (prefixes pick the RAREST tokens, so prefixFreq is
    *    small exactly where freq is large).
    *  - LENGTH: |B| >= ceil(t·|A|) ⇔ nb·den >= na·num (nb integral).
    *  - POSITIONAL: every pair is generated by its FIRST (rarest) shared
    *    token, which the prefix filter proves sits inside A's prefix; at
    *    positions (pa, pb) the overlap is bounded by 1 + min(na-pa,
    *    nb-pb), so require (1 + min)·den >= na·num. Later shared tokens
    *    may fail this bound and drop their duplicate candidate — that
    *    only thins the pre-verify stream (no distinct until after
    *    verification, which re-checks exactly).
    * Verification is the same native two-pointer sorted intersect. */
  def containmentPairs(docs: DataFrame, num: Int, den: Int,
                       broadcastVerify: Boolean = true,
                       tokensOf: Column = array_distinct(split(col("text"), " "))): DataFrame = {
    // num = 0 ("any pair") shares no prefix token for disjoint pairs and
    // can never surface from an index join — reject, as in jaccardPairs
    require(num >= 1 && num <= den, "need 1 <= num <= den (containment threshold in (0, 1])")
    graft.functions.SortedIntersectCount.register(docs.sparkSession)
    graft.functions.CharNGrams.register(docs.sparkSession)
    def hinted(df: DataFrame): DataFrame = if (broadcastVerify) broadcast(df) else df
    val sets = rankedSets(docs, tokensOf, hinted)
    // contained side: prefix tokens with 1-based position
    val prefixes = sets.select(col("doc_id"), col("nw"),
        posexplode(expr(s"slice(set, 1, CAST(nw - ((nw * $num + $den - 1) div $den) + 1 AS INT))")))
      .select(col("doc_id"), col("nw"), (col("pos") + 1).as("pp"), col("col").as("tr"))
    // container side: the full index, STATICALLY pruned by the corpus-wide
    // minimum set size. For any qualifying pair, the first shared token
    // sits in B at pb <= nb - overlap + 1 <= nb - ceil(t·na) + 1 <=
    // nb - ceil(t·naMin) + 1, so later positions can never generate a
    // pair's first-shared candidate — lossless, and it shrinks the
    // indexed side by ~t·naMin rows per doc (the bulk, at high t).
    // naMin is an O(1) scalar off the checkpointed sets table.
    val naMin = Option(sets.agg(min("nw")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val minKeep = (naMin * num + den - 1) / den // ceil(t·naMin)
    val full = sets.select(col("doc_id"), col("nw"), posexplode(col("set")))
      .select(col("doc_id"), col("nw"), (col("pos") + 1).as("pp"), col("col").as("tr"))
      .filter(col("pp") <= col("nw") - minKeep + 1)
    val cand = prefixes.as("a").join(full.as("b"),
        col("a.tr") === col("b.tr") && col("a.doc_id") =!= col("b.doc_id") &&
          col("b.nw") * den >= col("a.nw") * num &&
          (lit(1) + least(col("a.nw") - col("a.pp"), col("b.nw") - col("b.pp"))) * den >=
            col("a.nw") * num)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val verified = cand
      .join(hinted(sets).as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(hinted(sets).as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        expr("sorted_intersect_count(sa.set, sb.set)").as("inter_cnt"),
        col("sa.nw").as("na_cnt"))
      .filter(col("inter_cnt") * den >= col("na_cnt") * num)
      .distinct()
    verified.orderBy("doc_a", "doc_b")
  }

  /** Small-universe exact CONTAINMENT join — [[containmentPairs]] for the
    * regime where prefix filtering has no rare tokens to bite on (tiny
    * vocabulary: every inverted list approaches the whole corpus, and at
    * a dense threshold the qualifying OUTPUT itself is a large fraction
    * of n², so per-pair cost is what matters). Same semantics and output
    * schema as [[containmentPairs]] (spec-gated ≡): ordered pairs with
    * |A∩B| >= ceil(t·|A|).
    *
    * Shape: the contained side sits at its geometric size band's
    * (band, salt) HOME key; each container replicates to every POPULATED
    * band holding sizes it could contain (na <= ⌊nb·den/num⌋ — one-sided
    * thresholds reach arbitrarily far down, so replication is bounded by
    * the POPULATED band list, an O(#bands) metadata collect, not by a
    * ±1-band lemma). The pair join is EQUI-KEYED on (band, salt) — no
    * whole-corpus nested loop — and each ordered pair meets exactly once
    * (the container's replica at the contained doc's home key), so no
    * distinct is needed. Verification is one native AND+POPCNT pass
    * ([[graft.functions.BitAndCount]]) per enumerated pair.
    *
    * Regime map: big vocabulary → [[containmentPairs]] (prefix filtering
    * bites); small universe / dense output → THIS, composed with
    * blocking once n² per block is itself too big: `blockCol` restricts
    * pairs to docs sharing a key (language, source, LSH bucket — the
    * block column simply joins into the home/probe keys, and NULL-block
    * docs pair with nothing). A size distribution spanning many
    * populated bands degrades replication linearly in #populated-bands —
    * inherent to one-sided containment, and still never worse than the
    * nested loop it replaces. */
  def containmentPairsBitmap(docs: DataFrame, num: Int, den: Int,
                             tokensOf: Column = array_distinct(split(col("text"), " ")),
                             salts: Int = 8,
                             blockCol: Option[String] = None): DataFrame = {
    require(num >= 1 && num <= den, "need 1 <= num <= den (containment threshold in (0, 1])")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    graft.functions.BitAndCount.register(docs.sparkSession)
    val sigs = bitmapSignatures(docs, tokensOf, carry = blockCol.toSeq)
    // near-1 thresholds generate O(10³) geometric bounds out to 2^40; the
    // band of every row is found by a per-row scan of that array, so cut
    // it at the corpus' max set size (an O(1) scalar off the checkpointed
    // signature table) — bands above nwMax hold no doc, and maxNaBand
    // capping at the top populated band is exactly what the popBands
    // probe list needs
    val nwMax = Option(sigs.agg(max("nw")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val boundsArr = sizeBandBounds(num, den).takeWhile(_ <= nwMax)
    val bounds = typedLit(boundsArr.toSeq)
    val banded = sigs
      .withColumn("band", size(filter(bounds, b => b <= col("nw"))).cast(LongType) - 1)
    // O(#bands) metadata: which bands actually hold docs
    val popBands = banded.select("band").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val home = banded.withColumn("hv", pmod(xxhash64(col("doc_id")), lit(salts)))
    // container probes: every populated band whose sizes it could contain
    // (band(⌊nb·den/num⌋) >= p), crossed with every salt bucket
    val maxNaBand = size(filter(bounds,
        b => b <= expr(s"CAST(nw * $den DIV $num AS BIGINT)"))).cast(LongType) - 1
    val probes = banded
      .withColumn("pb", explode(filter(typedLit(popBands), p => p <= maxNaBand)))
      .withColumn("pv", explode(sequence(lit(0L), lit(salts - 1L))))
    val blockEq = blockCol.map(c => col(s"a.$c") === col(s"b.$c")).getOrElse(lit(true))
    val pairs = probes.as("b").join(home.as("a"),
        col("b.pb") === col("a.band") && col("b.pv") === col("a.hv") && blockEq &&
          col("a.doc_id") =!= col("b.doc_id") &&
          col("b.nw") * den >= col("a.nw") * num)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_and_count(a.bm, b.bm)").as("inter_cnt"),
        col("a.nw").as("na_cnt"))
      .filter(col("inter_cnt") * den >= col("na_cnt") * num)
    pairs.orderBy("doc_a", "doc_b")
  }

  /** Small-universe exact Jaccard join — the regime where [[jaccardPairs]]
    * collapses. PPJoin prefix filtering needs RARE tokens; over a tiny
    * universe (character n-grams: at most charset^n distinct, ~400 here)
    * every token is frequent, prefix inverted lists approach the whole
    * corpus, and candidate volume goes quadratic anyway (measured ~100M
    * candidate rows for 5k docs of char-3-grams — 22 s where this path
    * takes ~2 s). At small U the right exact representation is a BITMAP:
    * a doc's set is ⌈U/64⌉ longs, and |A∩B| is one native AND+POPCNT pass
    * (the codegen'd `bit_and_count`). The join is a broadcast nested loop
    * with the PPJoin length filter — n² pairs, but each pair costs ~U/64
    * machine ops instead of a candidate-list verification.
    *
    * Regime map (the 100 TB story): small U AND blocks ≤ ~10⁵ docs →
    * THIS (apply per label/LSH-bucket block at corpus scale — the n² is
    * per block); large U → [[jaccardPairs]] (rare tokens exist, prefix
    * filtering bites); web-scale approximate → [[nearDedup]].
    * Bitmaps are variable-width (⌈(maxRank+1)/64⌉ words per doc) so no
    * global U needs materializing; `bit_and_count` treats missing high
    * words as zeros. Output schema identical to [[jaccardPairs]]. */
  def jaccardPairsBitmap(docs: DataFrame, num: Int, den: Int,
                         tokensOf: Column = array_distinct(split(col("text"), " ")),
                         broadcastRight: Boolean = true): DataFrame = {
    // same contract as jaccardPairs (spec-tested ≡): reject num = 0 — the
    // bitmap path COULD emit disjoint pairs there, but then the two
    // "identical" operators would disagree on a degenerate threshold
    require(num >= 1 && num <= den, "need 1 <= num <= den (Jaccard threshold in (0, 1])")
    graft.functions.BitAndCount.register(docs.sparkSession)
    val bm = bitmapSignatures(docs, tokensOf)
    // broadcastRight = false drops the hint for corpora past the broadcast
    // limit: the non-equi join then plans as a (shuffle-partitioned)
    // cartesian — still n², which is this operator's contract; block the
    // input first when n² itself is the problem (see regime map above,
    // and [[jaccardPairsBitmapBlocked]] for the banded composition)
    val right = if (broadcastRight) broadcast(bm) else bm
    val pairs = bm.as("a").join(right.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          col("a.nw") * num <= col("b.nw") * den &&
          col("b.nw") * num <= col("a.nw") * den)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_and_count(a.bm, b.bm)").as("inter_cnt"),
        col("a.nw"), col("b.nw"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
        (col("a.nw") + col("b.nw") - col("inter_cnt")).as("union_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
    pairs.orderBy("doc_a", "doc_b")
  }

  /** The `(doc_id, nw, bm)` bitmap-signature table shared by the bitmap
    * Jaccard joins: distinct tokens → distributed dense vocabulary ranks
    * (no single-task window) → one native [[graft.functions.BitmapFromRanks]]
    * pass per doc. Eagerly local-checkpointed: every caller joins this
    * table against itself, and without materialization BOTH join branches
    * would re-execute the build (the broadcast exchange and the streamed
    * scan do not share a stage) — measured as 2× the dominant cost of the
    * whole operator. Docs with an empty token set have no row (explode
    * emits nothing), matching the SQL oracle's `len(s) > 0` guard. */
  private def bitmapSignatures(docs: DataFrame, tokensOf: Column,
                               carry: Seq[String] = Nil): DataFrame = {
    graft.functions.BitmapFromRanks.register(docs.sparkSession)
    graft.functions.CharNGrams.register(docs.sparkSession)
    val keyCols = "doc_id" +: carry
    val tok = spreadScan(docs)
      .select(keyCols.map(col) :+ explode(tokensOf).as("w"): _*)
    val rank = graft.operators.GlobalRank.withRank(
        tok.select("w").distinct(), numParts = 0, "r", col("w"))
      .select(col("w"), col("r"))
    tok.join(broadcast(rank), "w")
      .groupBy(keyCols.map(col): _*).agg(collect_list(col("r")).as("rs"))
      .select(keyCols.map(col) :+ size(col("rs")).cast(LongType).as("nw") :+
        expr("bitmap_from_ranks(rs)").as("bm"): _*)
      .pipe(graft.operators.Checkpoints.checkpoint(_)) // release handle: Checkpoints.release
  }

  /** Geometric size-band ids for the length filter `num·max(nwa, nwb) <=
    * den·min(nwa, nwb)`: integer boundaries B(0)=1, B(k+1)=⌊B(k)·den/num⌋+1,
    * band(nw) = the k with B(k) <= nw < B(k+1). Any pair passing the length
    * filter has band distance <= 1 (proof: nw_a < B(k+1) implies
    * nw_b <= ⌊(B(k+1)-1)·den/num⌋ <= B(k+2)-1), so probing {band, band+1}
    * loses nothing — and being integer arithmetic end-to-end, there is no
    * floating-log rounding hazard at exact-ratio boundaries. */
  private[graft] def sizeBandBounds(num: Int, den: Int): Array[Long] = {
    val bs = scala.collection.mutable.ArrayBuffer(1L)
    // BigInt step: bs.last·den can pass 2^63 for near-1 thresholds with
    // large denominators, and a wrapped-negative bound would break the
    // ascending-bounds invariant the band lemma rests on
    while (bs.last <= (1L << 40) && bs.length < 8192)
      bs += (BigInt(bs.last) * den / num + 1).min(BigInt(Long.MaxValue)).toLong
    bs.toArray // nw past the last bound all land in the final band: extra
               // enumerations there, never a lost pair
  }

  /** [[jaccardPairsBitmap]] composed with lossless size-band blocking — the
    * registered 100 TB shape: NO whole-corpus nested-loop join appears in
    * the plan. Each doc's home key is (size band, salt); the probe side
    * replicates each doc to both reachable bands × all `salts` buckets, and
    * the pair join is EQUI-KEYED on (band, salt) — a shuffled join whose
    * tasks each enumerate one tile of the (band-adjacent) pair space. The
    * length filter lives in the band key, so pairs outside the den/num size
    * ratio are never enumerated (~2× fewer candidates at threshold 4/5 on
    * the test corpus) — and a genuinely huge corpus would compose this with
    * LSH-bucket blocking per the regime map above.
    *
    * Pair-once accounting: a same-band pair meets exactly where the probe
    * doc's replica hits the home doc's (band, salt) — both orientations
    * match, so same-band keeps `a.doc_id < b.doc_id`; a band-distance-1
    * pair meets only via the lower-band doc's band+1 replica (the higher
    * doc never probes downward), so cross-band pairs canonicalize with
    * least/greatest. No distinct needed.
    *
    * `salts` scales tile parallelism linearly at O(salts) probe-side
    * replication of the small signature table (⌈U/64⌉ longs per row) —
    * size it ~ (cluster cores) / (distinct populated bands).
    * Output is identical to [[jaccardPairsBitmap]] (spec-gated). */
  def jaccardPairsBitmapBlocked(docs: DataFrame, num: Int, den: Int,
                                tokensOf: Column = array_distinct(split(col("text"), " ")),
                                salts: Int = 8): DataFrame = {
    require(num >= 1 && num <= den, "need 1 <= num <= den (Jaccard threshold in (0, 1])")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    graft.functions.BitAndCount.register(docs.sparkSession)
    val sigs = bitmapSignatures(docs, tokensOf)
    // the geometric bounds run out to 2^40 (O(10²–10³) entries at fine
    // ratios) and every row scans the array to find its band — truncate
    // at the corpus' max set size (O(1) scalar off the checkpointed
    // signature table); bands above nwMax hold no doc, and a probe band
    // past the top populated band can never match a home row
    val nwMax = Option(sigs.agg(max("nw")).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val bounds = typedLit(sizeBandBounds(num, den).takeWhile(_ <= nwMax).toSeq)
    val banded = sigs
      .withColumn("band", size(filter(bounds, b => b <= col("nw"))).cast(LongType) - 1)
    val home = banded.withColumn("hv", pmod(xxhash64(col("doc_id")), lit(salts)))
    val probeBands = // num = den forces nw equality — the upward probe can
      if (num == den) array(col("band")) // never match, skip the replicas
      else array(col("band"), col("band") + 1)
    val probes = banded
      .withColumn("pb", explode(probeBands))
      .withColumn("pv", explode(sequence(lit(0L), lit(salts - 1L))))
    val pairs = probes.as("a").join(home.as("b"),
        col("a.pb") === col("b.band") && col("a.pv") === col("b.hv") &&
          (col("a.band") =!= col("b.band") || col("a.doc_id") < col("b.doc_id")) &&
          col("a.nw") * num <= col("b.nw") * den &&
          col("b.nw") * num <= col("a.nw") * den)
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        expr("bit_and_count(a.bm, b.bm)").as("inter_cnt"),
        (col("a.nw") + col("b.nw")).as("sz"))
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"),
        (col("sz") - col("inter_cnt")).as("union_cnt"))
      .filter(col("inter_cnt") * den >= col("union_cnt") * num)
    pairs.orderBy("doc_a", "doc_b")
  }

  /** End-to-end MinHash/LSH near-dedup — the composition a pipeline user
    * calls: shingle MinHash signatures → banded LSH candidate pairs →
    * exact word-set Jaccard verification of candidates only → connected
    * components → (doc_id, cluster_rep). Never all-pairs: candidates come
    * from bucket joins; verification touches only candidates. Docs with
    * < 3 tokens (no shingles) stay singletons. */
  def nearDedup(docs: DataFrame, numHashes: Int = 16, bands: Int = 8,
                rowsPerBand: Int = 2, num: Int = 4, den: Int = 5,
                broadcastVerify: Boolean = true): DataFrame =
    clusters(docs.select("doc_id"),
      verifiedPairs(docs, numHashes, bands, rowsPerBand, num, den, broadcastVerify))

  /** The candidate-generation + exact-verification stage of [[nearDedup]],
    * exposed for plan auditing: LSH candidate pairs, each verified by
    * exact word-set Jaccard. Returns the surviving (doc_a, doc_b) edges.
    *
    * Scale contract for `broadcastVerify = true`: what gets broadcast is
    * CANDIDATE-bounded, never the corpus. The per-doc word-set table is
    * O(corpus tokens) — broadcasting it whole is an executor OOM at scale
    * regardless of how small the candidate set is. So the set table is
    * first semi-joined down to the distinct doc ids that appear in some
    * candidate pair (that id table IS LSH-bounded — ~dup mass — and is
    * itself broadcast into the semi-join, so the corpus-sized set build
    * never shuffles), and only the pruned survivors are broadcast into
    * the two verify joins. `broadcastVerify = false` keeps the fully
    * shuffled keyed-join shape (the embedNearDup verify shape) for
    * corpora whose dup mass itself is too large to broadcast. */
  private[graft] def verifiedPairs(docs: DataFrame, numHashes: Int, bands: Int,
                                   rowsPerBand: Int, num: Int, den: Int,
                                   broadcastVerify: Boolean): DataFrame = {
    require(bands * rowsPerBand <= numHashes,
      s"banding ($bands x $rowsPerBand) needs more hashes than numHashes=$numHashes")
    // verify uses size(array_intersect) on the raw STRING sets — here the
    // candidate volume is LSH-bounded (~dup mass), so the per-pair hash-set
    // allocation the PPJoin path avoids (see jaccardPairs) doesn't
    // dominate, and skipping the dictionary rank build saves two jobs
    val cand0 = lshCandidatePairs(minhashSignatures(docs, numHashes), bands, rowsPerBand)
    val sets = docs
      .select(col("doc_id"),
        sort_array(array_distinct(split(col("text"), " "))).as("set"))
      .select(col("doc_id"), col("set"),
        size(col("set")).cast(LongType).as("nw"))
    def verify(cand: DataFrame, s: DataFrame): DataFrame = cand
      .join(s.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(s.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.set"), col("sb.set"))).cast(LongType).as("inter"),
        col("sa.nw"), col("sb.nw"))
      .filter(col("inter") * den >= (col("sa.nw") + col("sb.nw") - col("inter")) * num)
      .select("doc_a", "doc_b")
    if (broadcastVerify) {
      // the candidate table feeds both the id pruning and the verify join
      // — checkpoint so the LSH banding job runs once, not twice
      val cand = graft.operators.Checkpoints.checkpoint(cand0)
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id")))
        .distinct()
      val pruned = sets.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      verify(cand, broadcast(pruned))
    } else verify(cand0, sets)
  }

  /** Survivor selection over ANY `(doc_id, cluster)` assignment —
    * [[clusters]]/[[nearDedup]]'s LSH components,
    * [[graft.embed.Similarity.embedNearDup]]'s embedding clusters, or an
    * exact-group assignment ([[exactBest]] is the fused single-pass form
    * for that case): keep the member with the highest `scoreCol` in
    * `scored` (tie → smallest doc_id). This is the SemDeDup/FineWeb
    * keep-one policy generalized: near-identical docs usually differ in
    * truncation or boilerplate, so the quality signal — not id order —
    * should pick the survivor. Members missing from `scored` (or with
    * NULL score) lose to any scored member; an all-unscored cluster keeps
    * its smallest doc_id with NULL best_score.
    *
    * Output: (cluster, rep_doc, best_score, cluster_size), one row per
    * cluster, ordered by cluster. Scale shape: one co-partitioned
    * equi-join on doc_id (left join — assignment is the spine) + one
    * map-side-combined aggregation; no window, nothing all-pairs. */
  def bestPerCluster(assign: DataFrame, scored: DataFrame,
                     scoreCol: String): DataFrame =
    assign
      .join(scored.select(col("doc_id"),
        col(scoreCol).cast(LongType).as("s")), Seq("doc_id"), "left")
      .groupBy("cluster")
      .agg(max_by(col("doc_id"), struct(col("s"), (-col("doc_id")).as("nid")))
          .as("rep_doc"),
        max("s").as("best_score"),
        count(lit(1)).as("cluster_size"))
      .select("cluster", "rep_doc", "best_score", "cluster_size")
      .orderBy("cluster")

  /** [[nearDedup]] composed with [[bestPerCluster]]: MinHash/LSH near-dup
    * clusters, survivor = the best-scored member. The `docs` frame carries
    * the score column (pass e.g. `TextAnalysis.quality` output joined on,
    * or any integer quality signal). */
  def nearDedupBest(docs: DataFrame, scoreCol: String, numHashes: Int = 16,
                    bands: Int = 8, rowsPerBand: Int = 2, num: Int = 4,
                    den: Int = 5): DataFrame =
    bestPerCluster(
      nearDedup(docs.select("doc_id", "text"), numHashes, bands, rowsPerBand,
        num, den),
      docs, scoreCol)

  /** Connected components over an undirected edge list (doc_a, doc_b):
    * min-label propagation accelerated with POINTER JUMPING — each round
    * also adopts label(label(v)), compressing label chains so convergence
    * is O(log diameter) rounds instead of O(diameter) (a long-chain
    * 137-doc cluster needs ~8 rounds, not ~130).
    *
    * Round shape: the |E|-sized edge table is hash-partitioned on its
    * lookup key ONCE (cached with that partitioning) and never moves
    * again — each round's neighbor join only exchanges the |V|-sized
    * label table, and the pointer jump is a |V|-sized self-join; the
    * only |E|-sized shuffle left per round is the min-label groupBy
    * (map-side combined). Convergence probe: the label-sum is strictly
    * decreasing until fixpoint — one agg on the checkpointed round
    * output, no compare join.
    * Returns (doc_id, cluster), cluster = min reachable id. */
  def clusters(allDocs: DataFrame, edges: DataFrame, maxIter: Int = 20,
               broadcastMaxLabels: Long = 1000000L): DataFrame = {
    // broadcast cap sizing: each round issues up to 3 broadcast hints of
    // the ~16 B/row label table (plus the final singleton join), and the
    // hint API leaves reclamation to ContextCleaner — at the cap that is
    // ~16 MB per broadcast across up to maxIter rounds of transient
    // driver/executor footprint. 1M rows keeps the worst case near the
    // default autoBroadcast ceiling; dedup-scale graphs (|V| = edge-touched
    // docs) sit far below it, and a graph above the cap takes the
    // all-shuffle rounds unchanged.
    val numParts = edges.sparkSession.sessionState.conf.numShufflePartitions
    // the raw cache keeps the possibly-expensive upstream edge join from
    // re-executing, and its count sizes the ROUND-SHAPE partitioning:
    // every round schedules ~3 stages over the edge table, so a small
    // graph paying conf-many near-empty tasks per round is pure scheduler
    // latency (measured ~20% of the whole dedup-clusters gate), while a
    // huge graph keeps conf partitions. AQE cannot do this here — a
    // coalesced exchange no longer advertises strict hashpartitioning,
    // which would re-exchange the |E| side every round (see below).
    val raw = edges.select(col("doc_a").as("src"), col("doc_b").as("dst")).cache()
    // Long math until the final clamp — 2·|E|/50k overflows Int past
    // ~5.4e13 edges, and a wrapped negative would collapse the rounds
    // to 2 partitions exactly where conf-many are needed most
    val parts = math.max(2L, math.min(numParts.toLong, 2 * raw.count() / 50000L + 1)).toInt
    // sym is CACHED, not checkpointed: InMemoryRelation preserves the
    // repartition's hashpartitioning(dst), so every round's join against
    // labels needs NO exchange on this — the big |E| — side (a
    // localCheckpoint'ed RDD scan advertises unknown partitioning and
    // gets re-exchanged every round; verified against the physical plan).
    // labels below DOES need localCheckpoint — its plan would otherwise
    // grow ~3^rounds and OOM the driver.
    val sym = raw
      .union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(parts, col("dst"))
      .cache()
    // propagate only over edge-touched docs — isolated docs are their own
    // cluster and never change, so keep them out of every round's joins
    var labels = sym.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster"))
      .pipe(graft.operators.Checkpoints.checkpoint(_))
    raw.unpersist(false) // sym (materialized by the labels checkpoint) owns the data now
    // BROADCAST the label table through the round joins when it is small:
    // the checkpointed scan advertises UnknownPartitioning, so the shuffle
    // plan re-exchanges |V| up to 3x per round — at dedup-cluster scales
    // (|V| = edge-touched docs, a sliver of the corpus) those exchanges
    // are pure stage latency, and one reused ~16B/row broadcast replaces
    // them all. A huge graph (|V| > the cap, ~32 MB driver-side) keeps
    // the all-shuffle rounds — the 100 TB path is unchanged.
    // |V| rides along the first convergence probe (one action, two aggs)
    var bcast = false
    def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
    // decimal(38,0): a Long sum of labels overflows once ids × docs pass
    // 2^63 (ANSI mode would fail the job at exactly the wrong scale).
    // SUM over an empty relation is NULL — map it to 0 so a corpus with no
    // duplicate pairs (empty edge set → empty labels) converges on round 1
    // instead of NPE-ing on the compareTo below.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster").cast("decimal(38,0)"))).collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    def labelSumAndCount(df: DataFrame): (java.math.BigDecimal, Long) = {
      val r = df.agg(sum(col("cluster").cast("decimal(38,0)")), count(lit(1))).collect()(0)
      (Option(r.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO), r.getLong(1))
    }
    // one propagation round. Invariant used by every inner join: any
    // cluster value IS the doc id of a labeled doc (labels cover all
    // edge-touched docs and only ever point at reachable doc ids), so no
    // asker is dropped.
    def propagate(ls: DataFrame, first: Boolean): DataFrame = {
      // neighbor candidates: v asks each neighbor for its label — sym is
      // pre-partitioned on dst, labels on dst''s hash (or broadcast): no
      // |E|-side exchange either way
      val nbr = sym.join(side(ls), sym("dst") === ls("doc_id"))
        .select(sym("src").as("doc_id"), ls("cluster").as("cand"))
      val rest = if (first) {
        // round 1: labels are the identity, so any pointer jump is a
        // no-op join — the self candidate (v, v) it would produce comes
        // straight off the cached label scan instead
        ls.select(col("doc_id"), col("cluster").as("cand"))
      } else {
        // DOUBLE pointer jump: v adopts label(label(label(v))) — one more
        // |V|-sized lookup per round compresses label chains ~3x per
        // round instead of ~2x, cutting the round count (each round is
        // several stages, so rounds are the latency unit). label^k(v) <=
        // label(v) keeps the adoption monotonic, and every candidate is
        // the label of a reachable doc, so min() stays the component min.
        val j1 = ls.as("l").join(side(ls.as("t")),
            col("l.cluster") === col("t.doc_id"))
          .select(col("l.doc_id").as("doc_id"), col("t.cluster").as("cand"))
        j1.as("j").join(side(ls.as("u")), col("j.cand") === col("u.doc_id"))
          .select(col("j.doc_id").as("doc_id"), col("u.cluster").as("cand"))
      }
      nbr.union(rest).groupBy("doc_id").agg(min("cand").as("cluster"))
    }
    val (sum0, nV) = labelSumAndCount(labels) // also materializes the checkpoint
    bcast = nV <= broadcastMaxLabels
    var prevSum = sum0
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val tR0 = System.nanoTime()
      // ONE round per checkpoint: labels feed three join inputs (nbr once,
      // jump twice), so an un-materialized multi-round composition would
      // re-execute the inner round per consumer — measured ~35% slower
      // than checkpointing (and probing) every round.
      // The checkpoint is LAZY: the convergence probe right below is the
      // round's first action, so one job both materializes the round's
      // partitions (persisted by localCheckpoint) and returns the sum —
      // an eager checkpoint would spend a second full job per round on
      // the same data (~2× the serial round latency).
      val next = graft.operators.Checkpoints.checkpoint(propagate(labels, iter == 0), eager = false)
      val s = labelSum(next) // materializes next's checkpoint
      changed = s.compareTo(prevSum) != 0
      prevSum = s
      // the prior round's blocks fed `next` and nothing else — free them
      // now instead of waiting out the GC (20-round graphs otherwise hold
      // 20 rounds of label blocks at peak)
      graft.operators.Checkpoints.release(labels)
      labels = next
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG")) println(f"CC round $iter changed=$changed sum=$prevSum ms=${(System.nanoTime() - tR0) / 1e6}%.0f")
    }
    sym.unpersist(false) // labels is checkpointed; the edge cache is done
    // add the untouched singletons back (labels broadcast when small — the
    // corpus side then meets no exchange before the output range sort)
    allDocs.select("doc_id").join(side(labels), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .orderBy("doc_id")
  }

  /** Connected components via BIG-STAR / SMALL-STAR alternation (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC 2014).
    * Since round 8 this is the q38 GATE form: the same-session A/B
    * (PLANS.md) measured it faster than [[clusters]]'s jump rounds at
    * sf0.1 (3.1 vs 4.2 s) and 1.8× faster at 10× (1.9M edges), with
    * identical labels (output signature + the parity suite). [[clusters]]
    * remains the |V|-exchange-per-round alternative. Same contract:
    * (doc_id, cluster), cluster = min reachable id, singletons included.
    *
    * Shape difference vs [[clusters]]: each star operation REWRITES the
    * edge set (every round exchanges O(|E|) edges through a groupBy + a
    * co-partitioned join + a distinct), where the jump rounds exchange
    * only the O(|V|) label table against a cache-partitioned edge table.
    * The payoff the paper proves is round count — O(log² n) with very few
    * rounds in practice — so this form wins when rounds (stage latency)
    * dominate and loses when |E| exchange volume does.
    *
    * Convergence: star sets are fixpoints of both operations, detected by
    * an exact set-equality probe (anti-join both ways is overkill — the
    * edge count plus a commutative 64-bit hash-sum signature matches only
    * ~2⁻⁶⁴-flukily on unequal sets; the parity suite pins equality with
    * [[clusters]] outright, which is the actual correctness gate). */
  def clustersStars(allDocs: DataFrame, edges: DataFrame,
                    maxIter: Int = 50): DataFrame = {
    // canonical directed-down edges: a > b, self-loops dropped
    var e: DataFrame = graft.operators.Checkpoints.checkpoint(
      edges.select(greatest(col("doc_a"), col("doc_b")).as("a"),
          least(col("doc_a"), col("doc_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct(), eager = false)

    // large-star: every node u links its LARGER neighbors to
    // m(u) = min(Γ(u) ∪ {u}); emitted edges stay directed-down (m < v)
    def largeStar(in: DataFrame): DataFrame = {
      val sym = in.select(col("a").as("u"), col("b").as("v"))
        .union(in.select(col("b").as("u"), col("a").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")).distinct()
    }
    // small-star: every node u links its smaller neighbors AND itself to
    // m(u) = min of its smaller neighborhood
    def smallStar(in: DataFrame): DataFrame = {
      val m = in.groupBy("a").agg(min("b").as("m"))
      in.join(m, "a")
        .select(explode(array(col("b"), col("a"))).as("x"), col("m"))
        .filter(col("x") =!= col("m"))
        .select(col("x").as("a"), col("m").as("b")).distinct()
    }
    def signature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var sig = signature(e) // materializes the canonical checkpoint
    var iter = 0
    var converged = sig._1 == 0L // no edges: everything is a singleton
    while (!converged && iter < maxIter) {
      val next = graft.operators.Checkpoints.checkpoint(
        smallStar(largeStar(e)), eager = false)
      val s = signature(next)
      converged = s == sig
      sig = s
      graft.operators.Checkpoints.release(e)
      e = next
      iter += 1
    }
    // at the star fixpoint every edge is (leaf, component-min)
    val labels = e.select(col("a").as("doc_id"), col("b").as("cluster"))
    val out = allDocs.select("doc_id").join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .orderBy("doc_id")
    out
  }

  /** INCREMENTAL connected components — the warm-start contract for the
    * clustering family ([[dedupDelta]]'s sibling: q213/q221/q222 ported
    * the prior-seeding contract to the fixed-point loops; this ports it
    * to [[clustersStars]]). Given the STORED labels of an existing graph
    * (`(doc_id, cluster)`, cluster = component min — the
    * [[clustersStars]] output shape) and a batch of NEW edges, computes
    * the labels of the UNION graph without re-reading the old edges:
    *
    *   ccDelta(clustersStars(V, E), ΔE) == clustersStars(V ∪ ends(ΔE), E ∪ ΔE)
    *
    * (spec-pinned). The mechanism is the QUOTIENT graph: each ΔE
    * endpoint lifts to its old component representative (itself when
    * new), star-CC runs on the lifted edges only — O(|ΔE|) work
    * regardless of corpus size — and the resulting relabel map
    * (old representative → new component min, ≤ 2·|ΔE| rows) is
    * BROADCAST onto the stored labels: the one full-table touch is a
    * map-side join, no shuffle of the corpus. New nodes (endpoints with
    * no stored label) enter labeled by their quotient component.
    *
    * Validity guards (the q213 prior contract, loud not silent): a
    * duplicate doc_id in `labels` RAISES (two labels for one doc has no
    * right answer — and would row-multiply through the join), and a
    * label ABOVE its node RAISES (the min-convention the quotient lift
    * relies on; a violating input is not a [[clustersStars]] output).
    * Old labels are otherwise TRUSTED as the stored artifact — exactly
    * [[dedupDelta]]'s corpus-signature stance: garbage stored components
    * give garbage merged components, by contract.
    *
    * 100 TB shape: the corpus label table is touched once, map-side; the
    * iterative work is delta-bounded (LSH/band-bucketed dedup emits
    * delta edges, this folds them in — the standing-corpus maintenance
    * loop's missing half). */
  def ccDelta(labels: DataFrame, newEdges: DataFrame,
              maxIter: Int = 50): DataFrame = {
    Seq("doc_id", "cluster").foreach(c => require(labels.columns.contains(c),
      s"labels must carry (doc_id, cluster) — missing $c"))
    Seq("doc_a", "doc_b").foreach(c => require(newEdges.columns.contains(c),
      s"newEdges must carry (doc_a, doc_b) — missing $c"))
    // de-fan + validity in one map-side-combined agg BEFORE any join
    val labs = labels
      .groupBy("doc_id")
      .agg(max("cluster").as("__c"), count(lit(1)).as("__n"))
      .select(col("doc_id"),
        when(col("__n") =!= 1L, raise_error(format_string(
            "ccDelta: labels has %s rows for doc %s — (doc_id, cluster) " +
              "must be unique", col("__n").cast("string"),
            col("doc_id").cast("string"))))
          .when(col("__c") > col("doc_id"), raise_error(format_string(
            "ccDelta: label %s exceeds doc %s — cluster must be the " +
              "component MIN (the clustersStars convention)",
            col("__c").cast("string"), col("doc_id").cast("string"))))
          .otherwise(col("__c")).as("cluster"))
    // NULL endpoints RAISE (the same loud-guard stance as the duplicate-
    // id and min-convention checks above)
    val edges = guardEdges(newEdges)
    // lift each delta endpoint to its component representative (itself
    // when the corpus has never seen it)
    val ends = edges.select(col("doc_a").as("n"))
      .union(edges.select(col("doc_b").as("n"))).distinct()
    val lifted = ends
      .join(labs.select(col("doc_id").as("n"), col("cluster")), Seq("n"), "left")
      .select(col("n"), coalesce(col("cluster"), col("n")).as("lbl"))
    val relabel = quotientRelabel(lifted, edges, maxIter)
    val newNodes = lifted
      .join(labs.select(col("doc_id").as("n")), Seq("n"), "left_anti")
      .select(col("n").as("doc_id"), col("lbl").as("cluster"))
    val all = labs.select("doc_id", "cluster").union(newNodes)
    // the single corpus-wide touch: map-side against the broadcast
    // relabel map (≤ 2·|ΔE| rows by construction)
    all.join(broadcast(relabel), all("cluster") === col("__from"), "left")
      .select(col("doc_id"), coalesce(col("__to"), col("cluster")).as("cluster"))
      .orderBy("doc_id")
  }

  /** The quotient-graph RELABEL MAP of folding `edges` into component
    * labels resolved as `lifted` (n = node, lbl = its current component
    * label; a never-seen node lifts to itself): star-CC runs on the
    * lifted edges only — O(|edges|) iterative work regardless of corpus
    * size — and the result is the (old label → new component min) map,
    * ≤ 2·|edges| rows, identity entries omitted. Shared by [[ccDelta]]
    * (which applies it corpus-wide immediately) and the DEFERRED-relabel
    * CC maintainer ([[graft.streaming.EventStreaming.CcStateMaintainer]],
    * which composes maps across batches and applies once at
    * compaction). */
  private[graft] def quotientRelabel(lifted: DataFrame, edges: DataFrame,
                                     maxIter: Int = 50): DataFrame = {
    val q = edges
      .join(lifted.select(col("n").as("doc_a"), col("lbl").as("la")), Seq("doc_a"))
      .join(lifted.select(col("n").as("doc_b"), col("lbl").as("lb")), Seq("doc_b"))
      .select(col("la").as("doc_a"), col("lb").as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
    val qnodes = lifted.select(col("lbl").as("doc_id")).distinct()
    // star-CC on the quotient: delta-bounded, the only iterative work
    val qcc = clustersStars(qnodes, q, maxIter)
    qcc.filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as("__from"), col("cluster").as("__to"))
  }

  /** [[ccDelta]]'s NULL-endpoint guard, shared with the CC maintainer:
    * a NULL join key would silently vanish the edge instead of
    * connecting anything. */
  private[graft] def guardEdges(newEdges: DataFrame): DataFrame = {
    def endpoint(c: String) = when(col(c).isNull, raise_error(lit(
        s"ccDelta: NULL $c endpoint in newEdges — edges must name two " +
          "non-NULL nodes"))).otherwise(col(c))
    newEdges.select(endpoint("doc_a").as("doc_a"),
      endpoint("doc_b").as("doc_b"))
  }

  /** EXACT-SUBSTRING dedup as a REWRITE (the Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better" operation;
    * cf. reference dedup scope `/root/reference/src` — the reference stops
    * at whole-record dedup, this is the span-level corpus hygiene pass
    * LLM pipelines add on top): any word n-gram occurring MORE THAN ONCE
    * in the corpus (another doc, or again in the same doc) keeps only its
    * FIRST occurrence in global (doc_id, position) order; every token
    * covered by a later occurrence is removed, and each doc's text is
    * rebuilt from its surviving tokens. [[TextAnalysis.duplicatedNgramStats]]
    * is the measuring cousin (how much is duplicated); this one actually
    * edits the corpus.
    *
    * Output: (doc_id, clean_text, n_tokens, n_removed), every input doc
    * present (docs under n tokens pass through untouched; a fully-covered
    * doc keeps an empty clean_text rather than vanishing). Deterministic:
    * keep-first is a total order, no sampling, no RNG.
    *
    * Scale shape (100 TB): occurrences are reduced to a 16-byte hash pair
    * (gram strings never cross an exchange — same trick as
    * duplicatedNgramStats); the keep/remove decision is ONE gram-hash-
    * partitioned window (count + row_number share the partitioning and
    * sort) — the ONLY full-corpus-width exchange in the plan. Everything
    * after is proportional to the DUPLICATED mass, not the corpus: removed
    * occurrences collapse to a per-doc removed-position set (one
    * aggregation over ≤ dup_occurrences × n rows), and the text rebuild is
    * a NARROW index-aware `filter` HOF over each doc's own tokens (the
    * first cut anti-joined the full token stream and re-assembled docs via
    * `collect_list` — two more corpus-wide string shuffles for identical
    * output; measured 10× slower at the second decade). Worst-case rebuild
    * cost is O(len · |removed|) per doc, bounded by the max doc length —
    * the same bounded-doc contract as [[Pipeline.chunk]]. A hash collision
    * (P < 1e-18 at 1e9 distinct grams) can only merge two gram
    * identities — over-removal of a duplicated-looking span, never a lost
    * document.
    */
  def removeDuplicatedSpans(docs0: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"span gram size must be >= 2, got $n")
    graft.functions.WordNgrams.register(docs0.sparkSession)
    // NULL text normalizes to "" up front — without this, Spark's
    // split(NULL) makes n_tokens = size(NULL) = -1 while a SQL oracle's
    // len(string_split(NULL)) is NULL: the q77 NULL-divergence class.
    // "" tokenizes to one empty token on BOTH engines, consistently.
    val docs = docs0.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val occ = docs
      .select(col("doc_id"), posexplode(TextOps.wordNgramsNative(n)).as(Seq("p", "g")))
      .select(col("doc_id"), col("p"), xxhash64(col("g")).as("gh1"), xhash(col("g")).as("gh2"))
    // one window: tot (does this gram duplicate?) and rn (is this the
    // first occurrence?) share the (gh1, gh2) partitioning and the
    // (doc_id, p) sort — a groupBy+self-join form would exchange the
    // occurrence frame twice more
    val w = Window.partitionBy("gh1", "gh2").orderBy("doc_id", "p")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // per-doc set of token positions covered by some non-first occurrence;
    // only docs that actually lose tokens appear (collect_set also dedups
    // the overlap between adjacent removed grams)
    val removedPos = occ
      .withColumn("rn", row_number().over(w))
      .withColumn("tot", count(lit(1)).over(wAll))
      .filter(col("tot") > 1 && col("rn") > 1)
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + lit(n - 1))).as("pos"))
      .groupBy("doc_id").agg(collect_set("pos").as("rm"))
    val ws = split(col("text"), " ")
    docs.join(removedPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        // untouched docs keep their text verbatim (split/join round-trips
        // even for repeated separators, but the fast path skips the work)
        when(col("rm").isNull, col("text"))
          .otherwise(array_join(
            filter(ws, (tok, i) => !array_contains(col("rm"), i)), " "))
          .as("clean_text"),
        size(ws).cast("long").as("n_tokens"),
        coalesce(size(col("rm")), lit(0)).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Edit-distance (Levenshtein) scored candidate pairs under record-
    * linkage BLOCKING — the character-level complement to the token-set
    * dedup family: catches typo/OCR-level near-dups whose word SETS
    * already diverge (Jaccard blind spot) while `maxDist` keeps the
    * decision threshold with the caller ([[nearDedup]]'s `verifiedPairs`
    * is the set-overlap analogue). Pairs are generated ONLY within a
    * blocking key — (first token, token count) by default — so the join
    * is a hash-partitioned equi-join, never all-pairs; `levenshtein` is
    * Spark's codegen'd built-in, O(|a|·|b|) per pair on the blocked
    * candidates only. Emits every blocked pair with its distance plus
    * the `is_dup` decision at `maxDist`, ordered (doc_a, doc_b).
    *
    * Blocking keys trade recall for scale the standard way: a near-dup
    * pair differing in its FIRST token or token count is missed — the
    * MinHash/LSH family (q19/q90) covers that regime; this operator is
    * the cheap high-precision pass for same-shape corpora (templated
    * docs, OCR re-scans). */
  def editDistancePairs(docs: DataFrame, maxDist: Long = 64L): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"),
      substring_index(col("text"), " ", 1).as("w0"),
      size(split(col("text"), " ")).as("nw"))
    // the probe side is hash-repartitioned on the block key WITH an
    // explicit partition count: a broadcast build keeps the stream side
    // at file-split granularity, and AQE coalesces a countless
    // repartition of byte-tiny input back to one partition — both funnel
    // every per-pair O(|a|·|b|) levenshtein into one task, because
    // nothing in the size-based planning sees the EXPENSIVE PROJECTION
    // downstream (measured 4.2 s → 0.9 s at sf0.1 from this line alone).
    // The explicit count pins the verify-compute parallelism; it is also
    // the partitioning a shuffled join needs once the corpus outgrows
    // the broadcast threshold. A pathologically hot block is AQE
    // skew-join territory, same as the other blocked joins.
    d.repartition(d.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("w0"), col("nw")).as("a").join(d.as("b"),
        col("a.w0") === col("b.w0") && col("a.nw") === col("b.nw") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.text"), col("b.text")).cast(LongType).as("dist"))
      .withColumn("is_dup", (col("dist") <= maxDist).cast("long"))
      .orderBy("doc_a", "doc_b")
  }
}

/** SimHash document fingerprinting: each distinct token votes ±1 on `bits`
  * bit positions of its hash; the fingerprint sets bit b iff the vote sum
  * is positive. Near-duplicate docs land at small Hamming distance.
  *
  * Fully NARROW: per doc, one fold over (token-hashes × bit positions)
  * inside higher-order functions — no explode, no shuffle. (The two-stage
  * groupBy form shuffled O(docs·tokens·bits) rows for identical output.) */
object SimHash {
  import TextOps._

  def fingerprints(docs: DataFrame, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, "need 1 <= bits <= 64")
    docs
      .select(col("doc_id"),
        expr(s"""transform(array_distinct(split(text, ' ')),
                 w -> CAST(conv(substring(md5(w),1,15),16,10) AS BIGINT))""").as("hs"))
      // per-bit vote sums: fold token hashes into a ±1-per-bit vector
      .select(col("doc_id"),
        expr(s"""aggregate(hs, array_repeat(CAST(0 AS BIGINT), $bits),
                 (acc, h) -> zip_with(acc, sequence(0, ${bits - 1}),
                   (a, b) -> a + CASE WHEN (shiftright(h, CAST(b AS INT)) & 1) = 1
                                 THEN 1 ELSE -1 END))""").as("sb"))
      .select(col("doc_id"),
        expr(s"""aggregate(zip_with(sb, sequence(0, ${bits - 1}),
                   (s, b) -> CASE WHEN s > 0
                             THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))
                             ELSE CAST(0 AS BIGINT) END),
                 CAST(0 AS BIGINT), (acc, x) -> acc + x)""").as("simhash"))
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
  /** Membership count built with Column operations (array_contains on a
    * lit array), NOT string-interpolated SQL — a marker containing a quote
    * must stay data, never become expression text. */
  private def markerCount(ws: Column, markers: Seq[String]): Column = {
    val dict = array(markers.map(lit): _*)
    size(filter(ws, w => array_contains(dict, w))).cast(LongType)
  }

  def langIdEnglish(docs: DataFrame, markers: Seq[String], threshold1000: Int): DataFrame = {
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        markerCount(col("ws"), markers).as("en_cnt"),
        expr("CAST(size(ws) AS BIGINT)").as("n_tokens"))
      .withColumn("score1000", expr("CAST(en_cnt * 1000 div n_tokens AS BIGINT)"))
      .withColumn("pred", when(col("score1000") >= threshold1000, lit("en")).otherwise(lit("unk")))
      .orderBy("doc_id")
  }

  /** Multi-language argmax over marker dictionaries (library form; tested
    * in sbt, not oracle-bound: argmax over maps is awkward in portable SQL). */
  def langIdArgmax(docs: DataFrame, dicts: Map[String, Seq[String]]): DataFrame = {
    require(dicts.nonEmpty, "need at least one language dictionary")
    val scored = dicts.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(markerCount(col("ws"), markers).cast(IntegerType).as("cnt"), lit(lang).as("lang"))
    }
    // greatest() requires >= 2 args; materialize the winner once (an
    // intermediate select) so the marker counting runs once per row, not
    // once per projected field
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), best.as("best"))
      .select(col("doc_id"),
        col("best.lang").as("pred_lang"),
        col("best.cnt").cast(LongType).as("marker_cnt"))
      .orderBy("doc_id")
  }

  /** Quality score: type-token ratio, average word length, stopword ratio —
    * integer-scaled ×1000, combined as (2·ttr + (1000 − stop)) div 3. */
  def quality(docs: DataFrame, stopwords: Seq[String],
              ordered: Boolean = true): DataFrame = {
    val out = docs.select(col("doc_id"), col("text"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        expr("CAST(size(ws) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(array_distinct(ws)) AS BIGINT)").as("n_distinct"),
        expr("CAST(length(text) AS BIGINT)").as("n_chars"),
        markerCount(col("ws"), stopwords).as("stop_cnt"))
      .withColumn("ttr1000", expr("CAST(n_distinct * 1000 div n_tokens AS BIGINT)"))
      .withColumn("awl1000", expr("CAST((n_chars - n_tokens + 1) * 1000 div n_tokens AS BIGINT)"))
      .withColumn("stop1000", expr("CAST(stop_cnt * 1000 div n_tokens AS BIGINT)"))
      .withColumn("quality", expr("CAST((2 * ttr1000 + (1000 - stop1000)) div 3 AS BIGINT)"))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Repetition metrics — the classic web-corpus quality filters
    * (duplicate-n-gram and top-n-gram mass): a doc dominated by one
    * repeated phrase or by copies of the same n-gram is boilerplate.
    * Per doc over word BIGRAM occurrences (not the distinct set):
    *  - `dup_frac1000`  = 1000·(total − distinct) div total
    *  - `top_frac1000`  = 1000·(most frequent bigram's count) div total
    * Docs with < 2 tokens have no bigrams and are absent.
    * Two hash-aggregates, both map-side combined — no joins, no windows. */
  def repetition(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(ws) - 2),
          |  i -> concat_ws(' ', element_at(ws, i+1), element_at(ws, i+2)))""".stripMargin))
        .as("g"))
    bg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("total"), count(lit(1)).as("distinct_g"), max("c").as("topc"))
      .select(col("doc_id"), col("total"),
        expr("1000 * (total - distinct_g) div total").as("dup_frac1000"),
        expr("1000 * topc div total").as("top_frac1000"))
      .orderBy("doc_id")
  }

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * (`[a-z]+|[0-9]+|[^a-z0-9 ]` — word pieces, number pieces, punct). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("ws_tokens"),
        expr("CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS BIGINT)").as("re_tokens"))
      .orderBy("doc_id")

  /** Hashed-linear classifier inference — the fastText / CCNet shape used
    * for model-based quality filtering: each token hashes into one of
    * `dim` feature buckets, and a document's logit is the sum of its
    * tokens' bucket weights (bag-of-words WITH multiplicity) plus a bias.
    * `weights` IS the model — (bucket BIGINT, w_permille BIGINT), e.g. a
    * trained linear classifier exported as a table; buckets absent from
    * the table weigh 0. Integer permille weights keep the score
    * engine-exact (the repo-wide determinism contract — same reason
    * [[quality]] emits ×1000 ratios, not doubles).
    *
    * Output: (doc_id, n_tokens, logit_permille, keep) — keep ∈ {0,1},
    * 1 iff logit_permille >= thresholdPermille. NULL text normalizes to
    * "" (one empty token) so both engines tokenize identically.
    *
    * Scale shape (100 TB): the model is hash-table-sized (≤ dim rows) →
    * broadcast; `explode` is narrow (a doc's tokens never leave its
    * partition) so the per-doc partial aggregate collapses each doc to one
    * row BEFORE the plan's only exchange — O(docs) rows, 24 bytes each.
    * One corpus scan, no windows, no corpus-width key shuffle. */
  def scoreHashedLinear(docs: DataFrame, weights: DataFrame, dim: Int,
                        biasPermille: Long = 0L,
                        thresholdPermille: Long = 0L): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    docs
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      // xhash is a non-negative 60-bit value, so plain % is already pmod
      .select(col("doc_id"), (xhash(col("w")) % dim).as("bucket"))
      .join(broadcast(weights.select("bucket", "w_permille")), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        coalesce(sum("w_permille"), lit(0L)).cast(LongType).as("wsum"))
      .select(col("doc_id"), col("n_tokens"),
        (col("wsum") + lit(biasPermille)).cast(LongType).as("logit_permille"))
      .withColumn("keep",
        when(col("logit_permille") >= thresholdPermille, lit(1L))
          .otherwise(lit(0L)).cast(LongType))
      .orderBy("doc_id")
  }

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

  /** CROSS-CORPUS duplicated-span statistics — for each doc, how many of
    * its word n-gram occurrences also occur ANYWHERE else (another doc, or
    * again in the same doc)? This is the "duplicated n-gram fraction"
    * quality signal public web-corpus pipelines filter on; [[repetition]]
    * is the intra-doc cousin (repeated bigrams within one doc only).
    * Output: (doc_id, n_grams, n_dup_grams, dup_permille), every doc
    * present (gramless short docs report zeros), integer-exact.
    *
    * Scale shape: each occurrence is reduced to a 16-byte hash pair
    * before anything wide happens, then counted per (gram, doc) with
    * map-side partial aggregation (intra-doc repeats — boilerplate —
    * compress BEFORE the exchange). The global per-gram total is then a
    * gram-PARTITIONED window over those compressed rows — one exchange,
    * where the groupBy+self-join form would exchange the per-doc frame
    * TWICE more (hashpartitioning(gh1, gh2, doc_id) does not satisfy a
    * join on (gh1, gh2)). One final exchange rolls up by doc_id.
    * Nothing materializes the gram STRINGS past the first projection, so
    * the wide state is O(occurrences) fixed-width rows. A hash collision
    * (P < 10^-18 at 10^9 distinct grams) can only overcount a duplicate —
    * it can never lose a document. */
  def duplicatedNgramStats(docs: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.WordNgrams.register(docs.sparkSession)
    val grams = docs
      .select(col("doc_id"), explode(TextOps.wordNgramsNative(n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh1"), xhash(col("g")).as("gh2"))
    val perDoc = grams.groupBy("gh1", "gh2", "doc_id").agg(count(lit(1)).as("cnt"))
    val stats = perDoc
      .withColumn("tot", sum("cnt").over(Window.partitionBy("gh1", "gh2")))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_grams"),
        sum(when(col("tot") > 1, col("cnt")).otherwise(lit(0L))).as("n_dup_grams"))
    docs.select("doc_id").join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
      .withColumn("dup_permille",
        when(col("n_grams") === 0, lit(0L))
          .otherwise(expr("1000 * n_dup_grams div n_grams")))
      .orderBy("doc_id")
  }
}

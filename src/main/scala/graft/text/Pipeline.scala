package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data pipeline staples over a `(doc_id, text)` corpus. All four
  * are deterministic and integer-exact, so they are oracle-checkable
  * cross-engine — reproducibility is the point: a data pipeline that
  * samples or splits differently on re-run poisons every downstream
  * ablation.
  *
  * All narrow, shuffle-free transforms except [[pack]] (one range shuffle
  * feeding a distributed two-pass prefix sum).
  *
  * The per-row operators take `ordered = true`: the default keeps the
  * oracle-deterministic trailing sort (free under batch composition —
  * EliminateSorts removes it below joins/aggregates); pass `false` to
  * compose onto a STREAMING DataFrame, because the analyzer's streaming
  * support check runs BEFORE the optimizer and rejects the sort that
  * would have been eliminated (spec: `StreamingTextOpsSpec`).
  */
object Pipeline {
  import TextOps.{xhash, P}

  /** Deterministic train/val/test split by CONTENT hash (stable under
    * doc_id renumbering and corpus reordering): bucket = h(text) mod 10 →
    * 0–7 train, 8 val, 9 test. NULL text hashes as the empty string —
    * identical content MUST share a split (leakage), and the naked-NULL
    * form would shunt every null doc into 'test' via the CASE fallthrough
    * instead of the content rule. */
  def datasetSplit(docs: DataFrame, ordered: Boolean = true): DataFrame = {
    val out = docs.select(col("doc_id"),
        ((xhash(coalesce(col("text"), lit(""))) % P) % 10).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") < 9, lit("val"))
          .otherwise(lit("test")))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Deterministic training-MIXTURE construction — the data-mixing step a
    * pretraining corpus goes through: given relative `weights` per source
    * and a total token `budget`, each source keeps a hash-Bernoulli
    * fraction sized so its expected sampled tokens ≈ budget·w/Σw, capped
    * at keeping everything (a source smaller than its target is taken
    * whole — no upweighting here; duplication policy is a separate,
    * explicit op). Sources without a weight are DROPPED.
    *
    * Determinism chain: per-source available tokens are exact integer
    * sums; the per-source keep-numerator is exact integer arithmetic
    * `min(den, den·budget·w / (Σw·avail))` (BigInt — no overflow at any
    * corpus size); membership is [[graft.operators.Sampling]]'s key-hash
    * rule, stable under retries/repartition/engines. The aggregate pass
    * collects O(#sources) rows to the driver — the same bounded-collect
    * pattern as the reference's splitter protocol; the sample itself is a
    * narrow filter. Rows whose source is NULL never match a stratum and
    * drop. */
  def mixture(docs: DataFrame, weights: Map[String, Long], budgetTokens: Long,
              sourceCol: String = "source", keyCols: Seq[String] = Seq("doc_id"),
              den: Int = 1000000,
              tokenCount: Column = size(split(col("text"), " ")).cast(LongType))
      : DataFrame = {
    require(weights.nonEmpty, "need at least one source weight")
    require(weights.values.forall(_ >= 0), "weights must be >= 0")
    require(budgetTokens >= 0, "budget must be >= 0")
    // `tokenCount` sizes the budget: default is whitespace words; pass
    // [[Bpe.countTokens]] to budget by subword tokens (what the model
    // actually consumes) — register the function on the session first
    val tokens = tokenCount
    // string-render the source (matching stratifiedByKeyHash's dispatch,
    // so non-string source columns work) and zero-fill the sum: a source
    // whose every text is NULL sums to NULL, which must mean avail = 0
    // (dropped below) — not a driver NPE
    val avail = docs
      .groupBy(col(sourceCol).cast(org.apache.spark.sql.types.StringType).as("__src"))
      .agg(coalesce(sum(tokens), lit(0L)).as("__avail"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    val wSum = weights.values.map(BigInt(_)).sum
    require(wSum > 0, "at least one weight must be positive")
    val fractions = weights.flatMap { case (src, w) =>
      avail.get(src).filter(_ > 0).map { a =>
        val num = (BigInt(den) * budgetTokens * w / (wSum * a)).min(BigInt(den))
        src -> (num.toInt, den)
      }
    }
    if (fractions.isEmpty) docs.filter(lit(false))
    else graft.operators.Sampling.stratifiedByKeyHash(docs, keyCols, sourceCol, fractions)
  }

  /** The duplication dual of [[mixture]]: deterministic EPOCH upsampling
    * for small high-quality sources (the standard pretraining practice of
    * repeating a source n.f times). A source with target `num/den` epochs
    * emits ⌊num/den⌋ full copies of every row, plus one more copy for the
    * deterministic hash-Bernoulli `num mod den / den` fraction — so the
    * expected token multiple is exactly num/den and membership of the
    * fractional epoch is stable under retries/repartition/engines (same
    * key-hash rule as [[graft.operators.Sampling]], but under a distinct
    * "epoch" SALT — sharing the unsalted hash would make the fractional
    * epoch perfectly correlated with any upstream [[graft.operators
    * .Sampling.byKeyHash]] pass on the same key and silently bias the
    * realized multiple). Sources without an entry pass through at one
    * epoch. Output adds an `epoch` column (0-based) keeping duplicated
    * rows distinguishable downstream — shard writers spread epochs, and
    * dedup-by-key still works. Narrow: a per-row bounded explode, no
    * shuffle. */
  def upsample(docs: DataFrame, epochs: Map[String, (Int, Int)],
               sourceCol: String = "source",
               keyCols: Seq[String] = Seq("doc_id")): DataFrame = {
    epochs.values.foreach { case (n, d) =>
      require(d >= 1 && n >= 0, s"invalid epoch target $n/$d")
      // n <= 1000·d, not n/d <= 1000: integer division would let 2001/2
      // (up to 1001 realized copies) slip past the documented bound
      require(n <= 1000L * d, s"epoch target $n/$d exceeds the 1000-copy sanity bound")
    }
    Seq("epoch", "__copies").foreach { c =>
      require(!docs.columns.contains(c), // silent overwrite would destroy
        s"input already has a '$c' column") // a prior epoch assignment
    }
    val h = graft.operators.Sampling.keyHash(keyCols, salt = "epoch")
    val copies = graft.operators.Sampling.strataCase(sourceCol, epochs,
      lit(1L): org.apache.spark.sql.Column) { case (n, d) =>
        lit((n / d).toLong) + when(h % d < n % d, 1L).otherwise(0L)
      }
    docs
      .withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") > 0, // sequence COUNTS DOWN on n <= 0
          sequence(lit(0L), col("__copies") - 1)).otherwise(array())))
      .drop("__copies")
  }

  /** Exact-quantile corpus filter — "keep the top (1 − num/den) of the
    * corpus by this score" with a DETERMINISTIC, engine-exact threshold:
    * rows whose integer `scoreCol` is >= the element at global 0-indexed
    * rank floor(num·n/den) of the non-NULL scores ascending (n = non-NULL
    * count). Percentile-threshold selection is how quality-classifier
    * scores ([[graft.text.TextAnalysis.scoreHashedLinear]], `.quality`)
    * become keep/drop decisions when the budget is a corpus FRACTION
    * rather than an absolute cutoff — and an approximate percentile
    * (`approx_percentile`) would make the kept set partition-dependent,
    * which poisons ablations (the same reproducibility argument as
    * [[datasetSplit]]).
    *
    * Cost: one range-shuffle sort of the projected Long score column
    * ([[graft.operators.OrderStats.exactSplitters]] — the TeraSort path,
    * O(parts) driver state), then a broadcast-threshold narrow filter of
    * the input. At 100 TB, callers who can tolerate sampling error should
    * derive the threshold from `OrderStats.sampledSplitters` (one pass
    * over a p-fraction sample) and filter with it directly — same shape,
    * no full sort. NULL scores never pass the filter. An all-NULL or
    * empty input returns the empty frame (a quantile of nothing keeps
    * nothing, rather than throwing mid-pipeline). */
  def filterByQuantile(docs: DataFrame, scoreCol: String, num: Int, den: Int,
                       numParts: Int = -1): DataFrame = {
    require(den >= 2 && num >= 1 && num < den,
      s"need 1 <= num < den (den >= 2), got $num/$den")
    val scored = docs.filter(col(scoreCol).isNotNull)
    val splitters = graft.operators.OrderStats
      .exactSplitters(scored, scoreCol, den, numParts)
      .filter(col("splitter_id") === num).collect()
    splitters.headOption match {
      case Some(row) => docs.filter(col(scoreCol).cast(LongType) >= row.getLong(1))
      case None      => docs.filter(lit(false))
    }
  }

  /** Per-group [[filterByQuantile]] — "keep each source's/language's top
    * (1 − num/den) by score": rows whose integer `scoreCol` is >= the
    * element at 0-indexed rank floor(num·n_g/den) of THEIR group's
    * non-NULL scores ascending (n_g = the group's non-NULL count). This is
    * the per-domain quality cut real curation applies — one global
    * threshold lets a verbose domain crowd out a terse one; per-group
    * fractions keep the mix while cutting each domain's tail.
    *
    * Deterministic despite the row_number over ties: the VALUE at a fixed
    * rank of a sorted multiset does not depend on tie order. NULL groups
    * form one group (null-safe join back); rows with NULL score never
    * pass; a group whose scores are all NULL is dropped entirely (its
    * quantile does not exist — same degrade as [[filterByQuantile]] on an
    * all-NULL corpus).
    *
    * Scale shape: one exchange on `groupCol` feeding two same-spec
    * windows (rank + group count — single sort, no second shuffle), an
    * O(#groups) threshold frame joined back co-partitioned. The in-group
    * sort serializes per group — right for MANY groups of bounded size
    * (domains, languages); for a handful of giant groups run
    * [[filterByQuantile]] per group instead (the global TeraSort path). */
  def filterByQuantilePerGroup(docs: DataFrame, scoreCol: String,
                               groupCol: String, num: Int, den: Int): DataFrame = {
    require(den >= 2 && num >= 1 && num < den,
      s"need 1 <= num < den (den >= 2), got $num/$den")
    Seq("__g", "__thr").foreach { c =>
      require(!docs.columns.contains(c), s"input already has a '$c' column")
    }
    val s = col(scoreCol).cast(LongType)
    val byG = org.apache.spark.sql.expressions.Window.partitionBy("__g")
    val thr = docs.filter(col(scoreCol).isNotNull)
      .select(col(groupCol).as("__g"), s.as("__s"))
      .withColumn("__rk", row_number().over(byG.orderBy(col("__s"))).cast(LongType) - 1)
      .withColumn("__n", count(lit(1)).over(byG))
      .filter(col("__rk") === expr(s"CAST($num * __n AS BIGINT) DIV $den"))
      .select(col("__g"), col("__s").as("__thr"))
    docs.join(thr, docs(groupCol) <=> thr("__g"))
      .filter(s >= col("__thr"))
      .drop("__g", "__thr")
  }

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace. Returns the normalized text plus a changed flag. */
  def normalize(docs: DataFrame, ordered: Boolean = true): DataFrame = {
    val out = docs.select(col("doc_id"), col("text"),
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))
      .select(col("doc_id"), col("norm_text"),
        (col("norm_text") =!= col("text")).as("changed"))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Fixed-size token chunking with overlap: windows of `chunkTokens`
    * starting every `chunkTokens - overlap` tokens (the trailing chunk may
    * be short). Output: (doc_id, chunk_idx, n_tokens, chunk_text). */
  def chunk(docs: DataFrame, chunkTokens: Int, overlap: Int,
            tokenizer: Column = split(col("text"), " ")): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    // `tokenizer` yields the array the windows slice: default whitespace
    // words (chunk_text re-joins to the original text); with a subword
    // tokenizer (expr(Bpe.tokensExpr("text"))) chunk_text is the
    // space-joined subword stream
    docs.select(col("doc_id"), tokenizer.as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(expr(s"sequence(0, size(ws) - 1, $step)")))
      // a start past size(ws) - overlap yields a chunk fully contained in
      // its predecessor (the predecessor already reached the doc end) —
      // pure duplicated training text; the cut is monotone (only trailing
      // starts drop), so chunk_idx stays dense
      .filter(col("col") === 0 || col("col") < size(col("ws")) - overlap)
      .select(col("doc_id"), col("pos").cast(LongType).as("chunk_idx"),
        expr(s"CAST(size(slice(ws, col + 1, $chunkTokens)) AS BIGINT)").as("n_tokens"),
        expr(s"array_join(slice(ws, col + 1, $chunkTokens), ' ')").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** PII scrubbing: replaces email addresses and phone-shaped numbers
    * with typed placeholders and counts what was redacted (the audit
    * trail a compliance pass needs). Patterns are deliberately
    * conservative and dialect-portable (identical semantics in Java
    * regex and RE2, so the DuckDB oracle replays them exactly); swap in
    * stricter patterns per jurisdiction at the call site. Narrow — one
    * projection, no shuffle. Output: (doc_id, n_emails, n_phones,
    * red_text). */
  def redactPii(docs: DataFrame, ordered: Boolean = true): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
    // counts must reconcile with the placeholders actually emitted: phones
    // are counted on the EMAIL-REDACTED text (a phone-shaped substring
    // inside an address — 'x@555-123-4567.com' — is consumed by the email
    // pass and must not inflate n_phones), so n_emails == #<EMAIL> and
    // n_phones == #<PHONE> by construction
    val afterEmail = regexp_replace(col("text"), email, "<EMAIL>")
    val out = docs.select(col("doc_id"),
        regexp_count(col("text"), lit(email)).cast(LongType).as("n_emails"),
        regexp_count(afterEmail, lit(phone)).cast(LongType).as("n_phones"),
        regexp_replace(afterEmail, phone, "<PHONE>").as("red_text"))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Eval-set decontamination: drops every doc whose normalized
    * bag-of-words fingerprint appears in `blocklist` (benchmark/eval
    * texts must not leak into training data). Output: the surviving
    * (doc_id, text) rows.
    *
    * The anti-join key is the same 124-bit hash pair as
    * [[Dedup.exactHashed]] — 16 bytes per row moves through the join, not
    * the documents. A collision can only FALSE-DROP a training doc
    * (P < 10^-18; harmless to model quality, never leaks an eval doc).
    * Spark broadcasts a small blocklist automatically (BroadcastHashJoin
    * LeftAnti); a blocklist past the broadcast threshold degrades to a
    * shuffled anti-join of 16-byte keys — both fine at 100 TB. (A bloom
    * prefilter would help only between those regimes; Spark 4 doesn't
    * expose `bloom_filter_agg` to third-party SQL, and the anti-join is
    * already key-only.) */
  def decontaminate(docs: DataFrame, blocklist: DataFrame): DataFrame = {
    def keyed(d: DataFrame) = d.select(col("doc_id"), col("text"),
        array_join(array_sort(array_distinct(split(col("text"), " "))), " ").as("fp"))
      .select(col("doc_id"), col("text"),
        xxhash64(col("fp")).as("fph1"), xhash(col("fp")).as("fph2"))
    keyed(docs).join(keyed(blocklist).select("fph1", "fph2"),
        Seq("fph1", "fph2"), "left_anti")
      .select("doc_id", "text")
      .orderBy("doc_id")
  }

  /** N-GRAM-OVERLAP decontamination — the standard published LLM eval
    * hygiene (GPT-3-style "13-gram collision" filtering): drop every
    * training doc that shares ANY word n-gram with any blocklist doc.
    * Strictly stronger than [[decontaminate]]'s whole-document
    * fingerprint: a doc that EMBEDS an eval answer inside otherwise-novel
    * text is caught here and missed there. Output: surviving
    * (doc_id, text).
    *
    * Scale shape: both sides reduce each n-gram occurrence to a 16-byte
    * hash pair in the scan projection — the gram strings never reach an
    * exchange. The blocklist side is distinct-ed (eval sets are small:
    * thousands of docs), so Spark broadcasts it and the corpus-side
    * semi-join is MAP-SIDE — the only wide work is distinct-ing the
    * contaminated doc_id set (tiny) and the final broadcast anti-join.
    * A blocklist past the broadcast threshold degrades to a shuffled
    * semi-join of fixed-width keys; both regimes are 100 TB-safe. A hash
    * collision can only FALSE-DROP a training doc (P < 10^-18), never
    * leak an eval doc. */
  def decontaminateNgrams(docs: DataFrame, blocklist: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    graft.functions.WordNgrams.register(docs.sparkSession)
    def gramKeys(d: DataFrame) = d
      .select(col("doc_id"), explode(TextOps.wordNgramsNative(n)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh1"), xhash(col("g")).as("gh2"))
    val blockGrams = gramKeys(blocklist).select("gh1", "gh2").distinct()
    val contaminated = gramKeys(docs)
      .join(blockGrams, Seq("gh1", "gh2"), "left_semi")
      .select("doc_id").distinct()
    docs.join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
      .orderBy("doc_id")
  }

  /** Contamination TRIAGE from KMV set sketches — the sketch-first
    * complement of [[decontaminateNgrams]]: instead of joining every
    * corpus gram against the blocklist, sketch each SOURCE's word
    * n-gram set and the benchmark's gram set once
    * ([[graft.operators.KmvSketch]] — one map pass, a fixed 256-Long
    * vector per source on the exchange), then read per-source overlap
    * ESTIMATES from the stored sketches: which sources are worth the
    * exact decontamination pass at all. At 100 TB this is the triage
    * that runs daily; the exact n-gram join runs only on the sources
    * this flags. Output per source: exact register agreement counts
    * (matches, hits) plus the rational estimates — source/benchmark/
    * union/intersection cardinalities and ⌊1000·|S∩B|/|B|⌋ benchmark
    * coverage — every read IEEE-deterministic and oracle-replayable.
    *
    * Scale shape: TWO gram scans (corpus keyed by source, blocklist
    * global) each collapsing into a fixed-width sketch aggregate — the
    * gram strings never reach an exchange; the benchmark sketch (ONE
    * row) meets the O(sources) sketch table in a broadcast product. */
  def contaminationEstimate(docs: DataFrame, blocklist: DataFrame,
                            n: Int, hexChars: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    import graft.operators.KmvSketch
    graft.functions.WordNgrams.register(docs.sparkSession)
    def grams(d: DataFrame, keys: Seq[Column]) = TextOps.spreadScan(d)
      .select(keys :+ explode(TextOps.wordNgramsNative(n)).as("g"): _*)
    val srcSk = KmvSketch.sketch(
      grams(docs, Seq(col("source"))), Seq("source"), "g", hexChars)
    val benchSk = KmvSketch.sketch(grams(blocklist, Nil), Nil, "g", hexChars)
      .select(col("kmv").as("__kv_b"))
    val a = col("kmv"); val b = col("__kv_b")
    val u = KmvSketch.merge(a, b)
    srcSk.crossJoin(broadcast(benchSk))
      .select(col("source"),
        KmvSketch.matches(a, b).as("matches"),
        KmvSketch.hits(u).as("hits"),
        KmvSketch.estimateRational(a, hexChars).as("src_est"),
        KmvSketch.estimateRational(b, hexChars).as("bench_est"),
        KmvSketch.estimateRational(u, hexChars).as("union_est"),
        KmvSketch.estimateIntersection(a, b, hexChars).as("inter_est"),
        KmvSketch.containmentPermille(a, b, hexChars).as("cont_permille"))
      .orderBy("source")
  }

  /** Per-DOC decontamination PRE-FILTER from a Bloom filter of the
    * benchmark's word n-grams — the SOUND sibling of the two passes
    * above: [[contaminationEstimate]] triages per SOURCE by a sampling
    * estimate (can under-read), [[decontaminateNgrams]] pays the exact
    * per-gram join for every doc. This pass sketches the blocklist ONCE
    * into a portable Bloom filter ([[graft.operators.BloomSketch]] —
    * O(set words) state, typically ≪ 1 MiB for an eval set) and gives
    * each doc a maybe-hit count against it. The Bloom one-sided-error
    * theorem is the contract: `n_maybe = 0` proves the doc shares NO
    * n-gram with the benchmark — those docs (the overwhelming majority
    * of a clean corpus) skip the exact join entirely, and no
    * contaminated doc can slip through (false positives only COST, they
    * never LEAK). Output per doc: (doc_id, n_grams = distinct grams,
    * n_maybe = grams the filter flags, needs_exact = 1 iff n_maybe > 0
    * — BIGINT, the flag convention); docs
    * with no n-gram (fewer than n words) are absent — they cannot be
    * contaminated at this n.
    *
    * Scale shape: the blocklist collapses into O(hit words) sparse
    * state rows that BROADCAST to the corpus scan; corpus grams reduce
    * to fixed-width hash slices in the scan projection (the
    * [[decontaminateNgrams]] discipline — gram strings never reach an
    * exchange), probe the state map-side, and fold with two map-side-
    * combined aggregations. The only wide work moves O(distinct grams
    * per doc) rows of four longs. */
  def decontamPrefilter(docs: DataFrame, blocklist: DataFrame, n: Int,
                        numWords: Int = 16384, k: Int = 3): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    import graft.operators.BloomSketch
    graft.functions.WordNgrams.register(docs.sparkSession)
    def grams(d: DataFrame, keys: Seq[Column]) = TextOps.spreadScan(d)
      .select(keys :+ explode(TextOps.wordNgramsNative(n)).as("g"): _*)
    val state = BloomSketch.sketchSparse(grams(blocklist, Nil), Nil, "g",
      numWords, k)
    BloomSketch.hitCounts(state, grams(docs, Seq(col("doc_id"))),
        Seq("doc_id"), "g", numWords, k)
      .select(col("doc_id"), col("n_values").as("n_grams"),
        col("n_maybe"),
        (col("n_maybe") > 0L).cast("bigint").as("needs_exact"))
      .orderBy("doc_id")
  }

  /** Decontamination via the Bloom pre-filter, PROVABLY equal to
    * [[decontaminateNgrams]]: probe every doc against the benchmark
    * filter ([[decontamPrefilter]]), pass the certified-clean majority
    * straight through (the one-sided-error theorem: n_maybe = 0 means
    * NO shared n-gram, so those docs survive the exact pass by
    * definition), and run the exact gram join ONLY on the flagged
    * sliver. Because contaminated ⊆ flagged, the exact join removes
    * exactly the docs the full pass would — the output is the full
    * pass's, row for row (the gate proves it: q258 hash-checks against
    * q69's plain-exact oracle). At 100 TB the exact join's input drops
    * from the corpus to (true contamination + the filter's ~0.5% false
    * positives); the pre-filter itself is a broadcast probe. Output:
    * surviving (doc_id, text), ordered. */
  def decontaminateNgramsPrefiltered(docs: DataFrame, blocklist: DataFrame,
                                     n: Int, numWords: Int = 16384,
                                     k: Int = 3): DataFrame = {
    val flaggedIds = decontamPrefilter(docs, blocklist, n, numWords, k)
      .filter(col("needs_exact") === 1L).select("doc_id")
    val clean = docs.join(flaggedIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("text"))
    val exactSurvivors = decontaminateNgrams(
      docs.join(flaggedIds, Seq("doc_id"), "left_semi"), blocklist, n)
    clean.unionByName(exactSurvivors).orderBy("doc_id")
  }

  /** Deterministic global TRAINING-ORDER shuffle: rank 0..n-1 in the
    * order sorted by (keyHash(salt, doc_id), doc_id). Training runs need
    * a random-looking example order that is reproducible across re-runs,
    * retries, and cluster sizes — `orderBy(rand(seed))` is none of those
    * (per-partition seeding), and a driver-side permutation doesn't
    * distribute. The hash gives the permutation; [[graft.operators
    * .GlobalRank]] gives the rank scalably (one range exchange, count
    * pass reusing its shuffle files — no single-task window). The salt
    * derives independent epoch orders ("epoch0", "epoch1", …) exactly as
    * [[graft.operators.Sampling.keyHash]] chains independent samplers.
    * Ties (60-bit hash collisions) break on doc_id — a strict total
    * order, so ranks are partitioning-invariant. Output: (rank, doc_id). */
  def trainingOrder(docs: DataFrame, salt: String = "order"): DataFrame = {
    val keyed = docs.select(col("doc_id"),
      graft.operators.Sampling.keyHash(Seq("doc_id"), salt).as("shuffle_key"))
    graft.operators.GlobalRank
      .withRank(keyed, numParts = -1, rankCol = "rank",
        col("shuffle_key"), col("doc_id"))
      .select(col("rank"), col("doc_id"))
  }

  /** SOURCE-BALANCED deterministic interleave — the low-discrepancy epoch
    * schedule: each source's docs land at fractions (2r+1)/(2·n_s) of the
    * epoch (r = the doc's salted-hash rank within its source), so any
    * prefix of the order holds each source in proportion to its size to
    * within ±1 — where [[trainingOrder]]'s plain hash shuffle drifts by
    * O(√L) and a naive concat-by-source is maximally skewed. The
    * fraction is ONE correctly rounded IEEE divide of exact integers
    * (both < 2^53), identical in every engine, and ties (equal-sized
    * sources share fraction grids) break on (source NULLS LAST, r) — a
    * strict total order. Output: (pos, doc_id, source).
    *
    * Scale shape: within-source ranks do NOT use a per-source window (a
    * grouped window funnels each source — 1/#sources of the corpus —
    * through ONE task). Instead one global range-sort rank over
    * (source, hash) makes each source's ranks contiguous, so the
    * within-source rank is `global rank − the source's first rank` — an
    * O(#sources) broadcast join — and the final position is a second
    * range-sort rank over the fraction key. Two TeraSort exchanges,
    * never a single-task sort. NULL sources group as ONE source under a
    * collision-proof key (real names are prefixed, so no data value can
    * alias the NULL group), and fraction ties between a NULL-source doc
    * and an equal-sized real source break NULL-LAST — the order `ORDER
    * BY source` produces under DuckDB's default, so the q75 oracle
    * agrees row-for-row even on null-source corpora. */
  def interleaveBySource(docs: DataFrame, salt: String = "interleave"): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    // grouping key only (contiguity in the first rank + the offset join);
    // output ORDER uses (source IS NULL, source) directly, never this key
    val srcKey = graft.operators.Sampling.nullSafeGroupKey("source")
    val ranked = graft.operators.GlobalRank.withRank(
      docs.select(col("doc_id"), col("source"), srcKey.as("_src"),
        graft.operators.Sampling.keyHash(Seq("doc_id"), salt).as("_h")),
      numParts = -1, rankCol = "_g", col("_src"), col("_h"), col("doc_id"))
    val offsets = ranked.groupBy("_src")
      .agg(min("_g").as("_off"), count(lit(1)).as("_ns"))
    val keyed = ranked.join(broadcast(offsets), "_src")
      .withColumn("_r", col("_g") - col("_off"))
      .withColumn("_key",
        (col("_r") * 2 + 1).cast(DoubleType) / (col("_ns") * 2).cast(DoubleType))
    graft.operators.GlobalRank.withRank(
        keyed.select(col("doc_id"), col("source"), col("_key"), col("_r")),
        numParts = -1, rankCol = "pos",
        col("_key"), col("source").isNull, col("source"), col("_r"))
      .select(col("pos"), col("doc_id"), col("source"))
  }

  /** Greedy sequence packing by starting offset: docs in doc_id order are
    * laid end-to-end; a doc belongs to pack `floor(start_offset /
    * capacity)`. Deterministic and integer-exact.
    *
    * The running token total is a DISTRIBUTED two-pass prefix sum
    * ([[graft.operators.PrefixSum]]), not a partitionless window — the
    * `SUM OVER (ORDER BY doc_id)` form collapses to one task holding the
    * whole corpus (`WindowExec: No Partition Defined`). */
  def pack(docs: DataFrame, capacityTokens: Int,
           tokenCount: Column = expr("CAST(size(split(text, ' ')) AS BIGINT)"))
      : DataFrame =
    graft.operators.PrefixSum.exclusive(
        docs.select(col("doc_id"), tokenCount.cast(LongType).as("n_tokens")),
        "n_tokens", "start_off", numParts = 0, col("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"CAST(start_off div $capacityTokens AS BIGINT)").as("pack_id"))
      .orderBy("doc_id")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.text.TextOps

/** Deterministic hash-Bernoulli sampling: a row is kept iff
  * `xhash(key) mod den < num` — membership is a pure function of the row's
  * key, so the sample is reproducible across engines, runs, task retries,
  * and cluster sizes (a seeded-RNG `.sample()` is none of those: Spark's
  * Bernoulli sampler is seeded per-partition, so a repartition or
  * speculative re-execution draws a different sample).
  *
  * This is the same splitter-friendly sampling contract as the reference's
  * `my.threshold` flag (uw-mapreduce `SamplerMapper`, reimplemented at
  * `SlidingAggregate.scalable`); here it is exposed as a standalone,
  * oracle-checkable operator. Narrow (a filter — no shuffle, fully
  * pushdown-friendly), and rows sharing a key travel together — pick the
  * key at the granularity the downstream consumer needs (a unique row key
  * for row sampling; a document/user key for leakage-free dataset splits,
  * same idea as `Pipeline.splitByHash`).
  */
object Sampling {

  /** The composite sampling key: columns cast to string, NULLs encoded as
    * a U+0002 sentinel, joined with a U+0001 separator. Neither control
    * char can appear in decimal renderings of numeric keys, so composite
    * keys can't alias ("1","23" vs "12","3"). The NULL sentinel matters:
    * `concat_ws` silently DROPS null elements and their separators, so
    * without it (a=NULL, b="7") and (a="7", b=NULL) would both key to "7"
    * and receive perfectly correlated sampling decisions. (A string key
    * whose literal value IS the one-char sentinel is indistinguishable
    * from NULL — use a non-control-character key domain.) */
  private def compositeKey(keyCols: Seq[String], salt: String = "") = {
    val parts = keyCols.map(c => coalesce(col(c).cast(StringType), lit("\u0002")))
    concat_ws("\u0001", (if (salt.isEmpty) parts else lit(salt) +: parts): _*)
  }

  /** The deterministic non-negative row hash every sampler here filters
    * on. `salt` derives an INDEPENDENT hash family for a composite that
    * chains with another sampler on the same key — without it, a
    * downstream decision (e.g. [[graft.text.Pipeline.upsample]]'s
    * fractional epoch) would be perfectly correlated with an upstream
    * [[byKeyHash]] and silently bias the realized fractions. The salt is
    * prepended as an extra leading key component through the SAME
    * separator/sentinel encoding (keep it free of the two control
    * chars), so salted and unsalted keys can never alias. */
  def keyHash(keyCols: Seq[String], salt: String = ""): Column =
    TextOps.xhash(compositeKey(keyCols, salt))

  /** The per-stratum dispatch shared by [[stratifiedByKeyHash]] and
    * [[graft.text.Pipeline.upsample]]: a deterministic (sorted) when-chain
    * matching `strataCol` RENDERED AS STRING against each entry — defined
    * once so the matching semantics (string render, NULL never matches,
    * fall through to default) cannot diverge between the two. */
  private[graft] def strataCase[A](strataCol: String, entries: Map[String, A],
                                   default: Column)(render: A => Column): Column =
    entries.toSeq.sortBy(_._1).foldRight(default) { case ((stratum, a), acc) =>
      when(col(strataCol).cast(StringType) === stratum, render(a)).otherwise(acc)
    }

  /** Keeps rows whose deterministic key hash lands below num/den. */
  def byKeyHash(df: DataFrame, keyCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(den >= 1, "den must be >= 1")
    require(num >= 0 && num <= den, "need 0 <= num <= den")
    // xhash is non-negative (60-bit), so plain % is already a positive mod
    df.filter(keyHash(keyCols) % den < num)
  }

  /** The complement sample — byKeyHash keeps hash < num/den, this keeps the
    * rest; together they partition the input exactly. */
  def byKeyHashComplement(df: DataFrame, keyCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(den >= 1, "den must be >= 1")
    require(num >= 0 && num <= den, "need 0 <= num <= den")
    df.filter(keyHash(keyCols) % den >= num)
  }

  /** Collision-proof grouping key over a possibly-NULL column: real
    * values are prefixed "v", NULL maps to "n", so no data value can
    * alias the NULL group. Shared by [[takePerGroup]] and
    * [[graft.text.Pipeline.interleaveBySource]] — their oracles (q75/q80)
    * both depend on this exact encoding, so it lives in one place. */
  private[graft] def nullSafeGroupKey(groupCol: String): Column =
    coalesce(concat(lit("v"), col(groupCol).cast(StringType)), lit("n"))

  /** Deterministic CAP-PER-GROUP subsample — "keep at most k rows per
    * group", the domain-capping step a pretraining mix applies to
    * over-represented sources: each group keeps the k rows with the
    * SMALLEST salted key hashes (a uniform, reproducible choice — stable
    * across engines, retries, repartitions; ties broken on the key
    * columns). `caps` overrides k per group (matched on `groupCol`
    * rendered as string, same dispatch as [[stratifiedByKeyHash]]); NULL
    * groups cap as ONE group under a collision-proof internal key.
    *
    * Scale shape: NO per-group window (a `row_number() OVER (PARTITION BY
    * group)` funnels each group through one task — the hot group IS the
    * problem being solved). Instead one global range-sort rank over
    * (group, hash) makes each group's ranks contiguous, and the
    * within-group rank is `global rank − the group's first rank` — an
    * O(#groups) broadcast join, exactly the
    * [[graft.text.Pipeline.interleaveBySource]] construction. */
  def takePerGroup(df: DataFrame, groupCol: String, k: Int,
                   keyCols: Seq[String] = Seq("doc_id"), salt: String = "cap",
                   caps: Map[String, Int] = Map.empty): DataFrame = {
    require(k >= 0, s"cap must be >= 0, got $k")
    caps.foreach { case (g, v) => require(v >= 0, s"cap for '$g' must be >= 0, got $v") }
    Seq("_grp", "_h", "_g", "_off").foreach { c =>
      require(!df.columns.contains(c), s"input already has a '$c' column")
    }
    val ranked = GlobalRank.withRank(
      df.withColumn("_grp", nullSafeGroupKey(groupCol)).withColumn("_h", keyHash(keyCols, salt)),
      numParts = -1, rankCol = "_g",
      (col("_grp") +: col("_h") +: keyCols.map(col)): _*)
    val offsets = ranked.groupBy("_grp").agg(min("_g").as("_off"))
    val cap = strataCase(groupCol, caps, lit(k.toLong))(v => lit(v.toLong))
    ranked.join(broadcast(offsets), "_grp")
      .filter(col("_g") - col("_off") < cap)
      .drop("_grp", "_h", "_g", "_off")
  }

  /** Deterministic STRATIFIED sampling — the training-mix rebalancer:
    * each stratum (language, source, quality bucket) keeps its own
    * num/den fraction of rows, decided by the same key hash, so the mix
    * is reproducible row-for-row (Spark's `stat.sampleBy` is seeded
    * per-partition and loses that under repartition/retry). Strata are
    * matched on `strataCol` rendered as a string; unlisted strata keep
    * `defaultFraction` (default: drop). Still a narrow filter. */
  def stratifiedByKeyHash(df: DataFrame, keyCols: Seq[String], strataCol: String,
                          fractions: Map[String, (Int, Int)],
                          defaultFraction: (Int, Int) = (0, 1)): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach { case (n, d) =>
      require(d >= 1 && n >= 0 && n <= d, s"invalid fraction $n/$d")
    }
    val h = keyHash(keyCols)
    def keep(nd: (Int, Int)) = h % nd._2 < nd._1
    df.filter(strataCase(strataCol, fractions, keep(defaultFraction))(keep))
  }

  /** Deterministic weight-proportional SYSTEMATIC sampling — ~`k` rows
    * drawn with probability proportional to a BIGINT weight (importance
    * sampling for training mixtures, weighted eval-set draws), with NO
    * randomness: lay the rows out on the cumulative-weight axis in
    * `orderCols` order and take one at every W/k stride. A row spanning
    * [cum, cum+w) is selected iff an integer multiple of W/k falls inside
    * — tested exactly as ⌊(cum+w)·k/W⌋ − ⌊cum·k/W⌋ ≥ 1 (no division of
    * the stride itself, so no rounding drift); `copies` = that
    * difference, the row's multiplicity under with-replacement semantics
    * (a row heavier than the stride legitimately draws multiple times —
    * weighted-bootstrap ready). Exactly k copies total across the
    * output, every row's selection a pure function of the data —
    * reproducible across engines, retries, and cluster sizes (the
    * float-keyed A-Res reservoir is none of those). Zero-weight rows are
    * never selected; negative weights raise.
    *
    * Scale shape: the cumulative position is a [[PrefixSum]] two-pass
    * range scan (never a partitionless window); the selection test is a
    * narrow map. W·k is overflow-guarded. `orderCols` must be a total
    * order for the layout to be well-defined (enforce uniqueness
    * upstream — typically the primary key). */
  def systematicWeighted(df: DataFrame, weightCol: String, k: Int,
                         orderCols: Column*): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderCols.nonEmpty, "systematicWeighted needs order columns")
    require(!df.columns.contains("copies"),
      "input already has a 'copies' column")
    val neg = df.filter(col(weightCol) < 0).limit(1).count()
    require(neg == 0L, s"negative weights in '$weightCol'")
    // O(1) driver scalar (the resample/decayedScore bounded-state class)
    val wRow = df.agg(sum(weightCol)).head
    val total = if (wRow.isNullAt(0)) 0L else wRow.getLong(0)
    if (total == 0L) return df.withColumn("copies", lit(0L)).limit(0)
    require(total <= Long.MaxValue / k,
      s"total weight $total * k=$k overflows Int64 — rescale weights")
    PrefixSum.exclusive(df, weightCol, "__cum", numParts = -1, orderCols: _*)
      .withColumn("copies",
        expr(s"((__cum + $weightCol) * $k) div ${total}L" +
          s" - (__cum * $k) div ${total}L"))
      .filter(col("copies") >= 1L)
      .drop("__cum")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket pair mining (association rules) with exact integer
  * statistics — which items co-occur in the same basket more often than
  * chance. The classic A-Priori observation does the scale work: an item
  * occurring in fewer than `minSupport` baskets cannot appear in a pair
  * with support ≥ `minSupport`, so infrequent items are pruned BEFORE the
  * quadratic per-basket pair generation, which is what bounds the
  * self-join fan-out (Σ k² over pruned baskets, the A-Priori bound).
  *
  * All derived statistics are exact BIGINT fractions (the library's
  * cross-engine determinism discipline — no floating division):
  * lift(a,b) = lift_num/lift_den = (pair_cnt·n_baskets)/(cnt_a·cnt_b);
  * confidence(a→b) = pair_cnt/cnt_a, read off the same columns.
  *
  * Scale shape: one distinct + one aggregation for item counts, a semi
  * join for the prune (frequent-item side is aggregate-sized — AQE
  * broadcasts it when small), one equi-self-join on the basket key with
  * map-side-combined pair counts, and the global basket count reduced to
  * ONE driver Long (never a nested-loop cross).
  */
object Association {

  /** Pairs (item_a < item_b) co-occurring in ≥ `minSupport` distinct
    * baskets. Output: (item_a, item_b, pair_cnt, cnt_a, cnt_b, n_baskets,
    * lift_num, lift_den), ordered by (item_a, item_b). */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
                    minSupport: Long): DataFrame = {
    val (b, freq, pairs) = prunedPairCounts(df, basketCol, itemCol, minSupport)
    // ONE distributed count-distinct aggregate whose single-Long result is
    // embedded as a literal — the scalar-attach join alternative constant-
    // folds its key and degrades to a nested-loop cross (plan-audit-banned)
    val nBaskets = b.select("bk").distinct().count()
    // lift_num = pair_cnt·n_baskets and lift_den = cnt_a·cnt_b are both
    // bounded by n_baskets², so Int64 exactness holds iff n_baskets ≤
    // ⌊√(2⁶³−1)⌋ — fail loudly rather than wrap (the z-order bit-width
    // ceiling discipline); past it, emit counts only and divide downstream
    require(nBaskets <= 3037000499L,
      s"lift fractions overflow Int64 at n_baskets=$nBaskets (> 3.03e9)")
    pairs
      .join(freq.select(col("i").as("item_a"), col("cnt").as("cnt_a")),
        Seq("item_a"))
      .join(freq.select(col("i").as("item_b"), col("cnt").as("cnt_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"), lit(nBaskets).as("n_baskets"),
        (col("pair_cnt") * nBaskets).as("lift_num"),
        (col("cnt_a") * col("cnt_b")).as("lift_den"))
      .orderBy("item_a", "item_b")
  }

  /** The shared A-Priori-pruned co-count pipeline: (distinct basket-item
    * rows, frequent-item counts, pair counts ≥ minSupport). */
  private def prunedPairCounts(df: DataFrame, basketCol: String,
                               itemCol: String, minSupport: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // a NULL basket would silently vanish from the pair join (null never
    // equi-joins) yet still count toward n_baskets, skewing every lift —
    // drop both null sides explicitly
    val b = df.select(col(basketCol).as("bk"), col(itemCol).as("i"))
      .filter(col("bk").isNotNull && col("i").isNotNull)
      .distinct()
    val itemCnt = b.groupBy("i").agg(count(lit(1)).as("cnt"))
    val freq = itemCnt.filter(col("cnt") >= minSupport)
    val fb = b.join(freq.select("i"), Seq("i"), "left_semi")
    val pairs = fb.as("x").join(fb.as("y"),
        col("x.bk") === col("y.bk") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minSupport)
    (b, freq, pairs)
  }

  /** Item-to-item similarity top-k — the "customers also bought"
    * neighborhood model (item-based collaborative filtering, Sarwar et
    * al., WWW'01) over co-occurrence counts: for every frequent item,
    * its k most-similar other items by cosine² over basket incidence
    * vectors, sim = pair_cnt²/(cnt_i·cnt_o), kept as a SCALED INTEGER —
    * sim_scaled = ((pair_cnt·scale div cnt_i)·pair_cnt) div cnt_o, a
    * nested form every engine replays bit-identically AND that stays
    * inside Int64 structurally (pair_cnt ≤ cnt_i bounds the first
    * quotient by `scale`; exact for pair_cnt ≤ 9.2e12). cosine² is
    * monotone in cosine on non-negative counts, so the ranking is the
    * cosine ranking; ties break on the smaller neighbor id.
    *
    * Output: (item, other, pair_cnt, cnt_i, cnt_o, sim_scaled, rank),
    * rank 1..k per item, ordered by (item, rank).
    *
    * Scale shape: the [[frequentPairs]] A-Priori-pruned co-count pipeline
    * (each undirected pair counted once), symmetrized by a zero-shuffle
    * union, then ONE window partitioned by item over the support-pruned
    * pair table — never over baskets or raw rows. */
  def itemSimilarity(df: DataFrame, basketCol: String, itemCol: String,
                     minSupport: Long, k: Int,
                     scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale >= 1 && scale <= 1000000000L,
      s"scale must be in [1, 1e9], got $scale")
    val (_, freq, pairs) = prunedPairCounts(df, basketCol, itemCol, minSupport)
    val wc = pairs
      .join(freq.select(col("i").as("item_a"), col("cnt").as("cnt_a")),
        Seq("item_a"))
      .join(freq.select(col("i").as("item_b"), col("cnt").as("cnt_b")),
        Seq("item_b"))
    val sym = wc.select(col("item_a").as("item"), col("item_b").as("other"),
        col("pair_cnt"), col("cnt_a").as("cnt_i"), col("cnt_b").as("cnt_o"))
      .unionByName(wc.select(col("item_b").as("item"),
        col("item_a").as("other"), col("pair_cnt"),
        col("cnt_b").as("cnt_i"), col("cnt_a").as("cnt_o")))
    val scored = sym.withColumn("sim_scaled",
      expr(s"(((pair_cnt * ${scale}L) div cnt_i) * pair_cnt) div cnt_o"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("item")
      .orderBy(col("sim_scaled").desc, col("other"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("item"), col("other"), col("pair_cnt"), col("cnt_i"),
        col("cnt_o"), col("sim_scaled"), col("rank"))
      .orderBy("item", "rank")
  }
}

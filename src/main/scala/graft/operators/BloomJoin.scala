package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.execution.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated semi join — the "runtime row-level filter"
  * pattern for the canonical 100 TB shape: a huge fact table semi-joined
  * to a (filtered) key set that is too large to broadcast as an exact
  * hash table but whose BLOOM SKETCH is tiny. The key side is sketched
  * once with Spark's own `BloomFilterAggregate` (the expression behind
  * `spark.sql.optimizer.runtime.bloomFilter`), the sketch ships to every
  * fact scan task as a literal, and `BloomFilterMightContain` — a
  * codegen'd predicate on `xxhash64(key)` — drops the vast majority of
  * non-matching fact rows BEFORE the join's exchange. A final exact
  * left-semi join removes the sketch's false positives, so the result is
  * bit-identical to the plain semi join (the oracle checks exactly that).
  *
  * Why not rely on Spark's auto-injected runtime filter? It only fires
  * when the planner's heuristics see a selective creation-side join key
  * (`InjectRuntimeFilter`), never across the API seams a library composes
  * (checkpointed key sets, programmatic pipelines); this makes the plan
  * shape explicit, deterministic, and spec-testable.
  *
  * Scale contract: `numBits` bounds the sketch (default 2^23 bits = 1 MiB
  * — below Spark's own runtime-filter cap), so driver memory and task
  * broadcast cost are O(1) in the fact size; the exact corrective join
  * shuffles only the bloom survivors. All integer/hash work, zero UDFs.
  * The key side is `distinct()`ed before sketching, which also bounds the
  * partial-aggregate merge to shuffle-partitions × numBits/8 bytes (each
  * partial IS a full bitset — sketching an unaggregated million-partition
  * key table would funnel partitions × 1 MiB into the final merge task).
  *
  * WHEN TO USE — measured honestly (`BloomScaleProbeMain`, 60M fact rows,
  * local[32]): with a broadcastable key side the plain broadcast-hash
  * left-semi wins outright (0.5 s vs 2.2 s — it is already a perfect
  * zero-FP filter with one hash probe and no sketch job), and even at 3M
  * keys local mode favors the plain shuffled join (3.4 s vs 6.6 s),
  * because a local "shuffle" is a memory-bandwidth copy while the bloom
  * probe pays ~k cache-missing bitset reads per fact row. The operator's
  * regime is the one local mode cannot exhibit: a NETWORK-shuffled
  * cluster where the fact side is orders of magnitude larger than
  * memory, the key side exceeds the broadcast threshold, and match
  * selectivity is low — there, dropping 99% of fact bytes before the
  * wire is the entire game (the same economics behind Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter`, which targets exactly this
  * shape and also never fires on broadcastable builds).
  */
object BloomJoin {

  /** Registers `graft_bloom_agg(key, numItems, numBits)` (aggregate →
    * binary sketch) and `graft_bloom_contains(sketchBinary, key)` for the
    * SQL surface; idempotent per session. Keys are hashed with the same
    * `xxhash64` on both sides — callers never hash manually. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_agg")))
      reg.createOrReplaceTempFunction("graft_bloom_agg", aggBuilder, "built-in")
    if (!reg.functionExists(FunctionIdentifier("graft_bloom_contains")))
      reg.createOrReplaceTempFunction("graft_bloom_contains", containsBuilder, "built-in")
  }

  def aggBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(key, numItems, numBits) =>
      // SQL int literals arrive as INT; the aggregate demands BIGINT
      def asLong(e: Expression) =
        if (e.dataType == org.apache.spark.sql.types.LongType) e
        else org.apache.spark.sql.catalyst.expressions.Cast(e,
          org.apache.spark.sql.types.LongType)
      new BloomFilterAggregate(new XxHash64(Seq(key)), asLong(numItems), asLong(numBits))
    case other => throw new IllegalArgumentException(
      s"graft_bloom_agg(key, estimatedNumItems, numBits) takes 3 arguments, got ${other.size}")
  }

  def containsBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(sketch, key) =>
      BloomFilterMightContain(sketch, new XxHash64(Seq(key)))
    case other => throw new IllegalArgumentException(
      s"graft_bloom_contains(sketch, key) takes 2 arguments, got ${other.size}")
  }

  /** One distributed aggregation over the key side → the serialized bloom
    * sketch. O(numBits/8) bytes of driver/model state — the same bounded
    * class as IVF centroids or PQ codebooks, NOT an O(keys) collect. */
  def sketch(keys: DataFrame, keyCol: String,
             expectedItems: Long = 1L << 20,
             numBits: Long = 1L << 23): Array[Byte] = {
    require(expectedItems > 0 && numBits > 0, "expectedItems and numBits must be positive")
    val agg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(col(keyCol)))),
        GraftColumnBridge.expression(lit(expectedItems)),
        GraftColumnBridge.expression(lit(numBits))).toAggregateExpression())
    keys.agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** The `might_contain` predicate over `keyCol` for a previously built
    * sketch — a plain codegen'd Column, usable in any `.filter`. */
  def mightContain(sketchBytes: Array[Byte], key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    GraftColumnBridge.column(containsBuilder(Seq(
      GraftColumnBridge.expression(lit(sketchBytes)),
      GraftColumnBridge.expression(key))))

  /** `fact LEFT SEMI JOIN keys` with a bloom prefilter on the fact side:
    * sketch the (distinct) key side, filter fact rows through
    * `might_contain` before any exchange, then exact-semi-join the
    * survivors. Result ≡ the plain semi join; the prefilter only changes
    * how many fact rows reach the shuffle. */
  def semiJoin(fact: DataFrame, factKey: String,
               keys: DataFrame, keysKey: String,
               expectedItems: Long = 1L << 20,
               numBits: Long = 1L << 23): DataFrame = {
    // rename the key side's column so a same-named fact key can't make
    // the join condition ambiguous
    val keySet = keys.select(col(keysKey).as("__bloom_key")).distinct()
    val bytes = sketch(keySet, "__bloom_key", expectedItems, numBits)
    fact.filter(mightContain(bytes, col(factKey)))
      .join(keySet, col(factKey) === col("__bloom_key"), "left_semi")
  }
}

package graft

import graft.operators.{GlobalRank, OrderStats, PrefixSum, RangeInputCache, SlidingAggregate}
import org.apache.spark.sql.functions.col
import org.apache.spark.storage.StorageLevel

/** The range-shuffle input-cache knob
  * (`spark.graft.rangeInput.storageLevel`): results must be identical with
  * the cache on, off, and at DISK_ONLY, a caller's own cache must survive
  * the operator (CacheManager keys by analyzed plan — a library
  * persist/unpersist of an identical plan would drop it), and the library's
  * own cache must not linger after the operator returns. */
class RangeInputCacheSpec extends SparkSpec {
  import spark.implicits._

  private def withKnob[A](value: String)(body: => A): A = {
    val prev = spark.conf.getOption(RangeInputCache.ConfKey)
    spark.conf.set(RangeInputCache.ConfKey, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(RangeInputCache.ConfKey, v)
      case None    => spark.conf.unset(RangeInputCache.ConfKey)
    }
  }

  private val rng = new scala.util.Random(7L)
  private def df = Seq.fill(500)((rng.nextInt(1000).toLong, rng.nextInt(100).toLong))
    .toDF("key", "value")

  test("identical results with cache MEMORY_AND_DISK / DISK_ONLY / NONE") {
    val input = Seq.tabulate(500)(i => ((i * 37L) % 997, i.toLong)).toDF("key", "value")
    def all() = (
      GlobalRank.withRank(input, 4, "rank", col("key")).orderBy("rank").collect().toSeq,
      SlidingAggregate.scalable(input, "key", "value", 10, 4).orderBy("rank").collect().toSeq,
      OrderStats.exactSplitters(input, "key", 8, 4).collect().toSeq,
      PrefixSum.exclusive(input.select(col("key"), col("value")), "value", "pfx", 4, col("key"), col("value"))
        .orderBy("key", "value").collect().toSeq)
    val base = withKnob("MEMORY_AND_DISK")(all())
    assert(withKnob("DISK_ONLY")(all()) == base)
    assert(withKnob("NONE")(all()) == base)
  }

  test("a caller's own cache survives the operator (no silent drop)") {
    val input = Seq.tabulate(200)(i => (i.toLong, (i * 3).toLong)).toDF("key", "value")
    input.persist(StorageLevel.MEMORY_ONLY)
    try {
      input.count()
      GlobalRank.withRank(input, 4, "rank", col("key")).collect()
      assert(input.storageLevel == StorageLevel.MEMORY_ONLY,
        "operator dropped the caller's cache entry")
      PrefixSum.exclusive(input, "value", "pfx", 4, col("key")).collect()
      assert(input.storageLevel == StorageLevel.MEMORY_ONLY,
        "PrefixSum dropped the caller's cache entry")
    } finally input.unpersist(blocking = true)
  }

  test("NONE disables the library persist entirely") {
    withKnob("NONE") {
      val input = Seq.tabulate(100)(i => (i.toLong, i.toLong)).toDF("key", "value")
      val (acquired, release) = {
        // exercise the helper directly: with the knob off it must hand back
        // the same uncached frame
        val pair = graft.operators.RangeInputCache.acquire(input)
        pair
      }
      assert(acquired.storageLevel == StorageLevel.NONE)
      release()
      assert(input.storageLevel == StorageLevel.NONE)
    }
  }

  test("DISK_ONLY knob is honored by the helper") {
    withKnob("DISK_ONLY") {
      val input = Seq.tabulate(100)(i => (i.toLong, i.toLong)).toDF("key", "value")
      val (acquired, release) = RangeInputCache.acquire(input)
      try assert(acquired.storageLevel == StorageLevel.DISK_ONLY)
      finally release()
      assert(input.storageLevel == StorageLevel.NONE, "release() must uncache")
    }
  }
}

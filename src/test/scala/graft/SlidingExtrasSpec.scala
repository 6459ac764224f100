package graft

import graft.operators.{LongMonoid, SlidingAggregate}

/** Covers the round-2 additions to the sliding aggregate: the explicit
  * sample-threshold splitter path (reference `my.threshold`) and the avg
  * aggregate (sql ↔ scalable parity). */
class SlidingExtrasSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7L)
  private val data = Seq.fill(211)((rng.nextInt(100000).toLong, rng.nextInt(2000).toLong - 1000L))
    .zipWithIndex.map { case ((k, v), i) => (k * 1000 + i, v) } // unique keys

  test("sample-threshold splitter path matches the default partitioner path") {
    val df = data.toDF("key", "value")
    val base = SlidingAggregate.scalable(df, "key", "value", 37, 4, LongMonoid.Sum)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (t <- Seq(0.1, 0.5, 1.0)) {
      val got = SlidingAggregate.scalable(df, "key", "value", 37, 4, LongMonoid.Sum, Some(t))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.sameElements(base), s"threshold=$t diverged")
    }
  }

  test("tiny sample (threshold ~ 0) falls back gracefully, result unchanged") {
    val df = data.toDF("key", "value")
    val got = SlidingAggregate.scalable(df, "key", "value", 10, 8, LongMonoid.Sum, Some(1e-6))
      .count()
    assert(got == data.size)
  }

  test("avg: scalable(sum)+withAvg matches sql('avg') exactly") {
    val df = data.toDF("key", "value")
    for (l <- Seq(1, 13, 100, 300)) {
      val viaSql = SlidingAggregate.sql(df, "key", "value", l, "avg")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      val viaScalable = SlidingAggregate.withAvg(
          SlidingAggregate.scalable(df, "key", "value", l, 4, LongMonoid.Sum), l)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(viaScalable == viaSql, s"window=$l")
    }
  }
}

package graft

import graft.operators.OrderStats

/** Brute-force property checks for the single-shuffle order-statistic
  * operators (their driver gates q08/q10 only probe one configuration). */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(11L)

  for ((n, k, parts) <- Seq((100, 8, 4), (997, 5, 8), (64, 64, 16), (10, 4, 32))) {
    test(s"exactSplitters n=$n k=$k parts=$parts matches sorted order statistics") {
      val data = Seq.fill(n)(rng.nextInt(1000).toLong)
      val sortedData = data.sorted
      val got = OrderStats.exactSplitters(data.toDF("key"), "key", k, parts)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val expect = (1 until k).map(i => (i.toLong, sortedData((i * n / k).toInt)))
      assert(got.toSeq == expect)
    }
  }

  test("exactSplitters k > n: colliding target ranks each still get a row") {
    // n=3, k=8 → target ranks (i*3/8) = 0,0,1,1,1,2,2 for i=1..7: heavy collisions
    val got = OrderStats.exactSplitters(Seq(10L, 20L, 30L).toDF("key"), "key", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = Seq(10L, 20L, 30L)
    val expect = (1 until 8).map(i => (i.toLong, sorted((i * 3 / 8))))
    assert(got.toSeq == expect, "a colliding splitter was silently dropped")
  }

  test("sampledSplitters k > n: one row per splitter id at the shared key") {
    val got = OrderStats.sampledSplitters(Seq(10L, 20L, 30L).toDF("key"), "key", 8, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = Seq(10L, 20L, 30L)
    val expect = (1 until 8).map(i => (i.toLong, sorted((i * 3 / 8))))
    assert(got.toSeq == expect)
  }

  test("sampledSplitters at threshold 1.0 equals the exact order statistics") {
    val data = Seq.fill(500)(rng.nextInt(100000).toLong)
    val exact = OrderStats.exactSplitters(data.toDF("key"), "key", 8, 4)
      .collect().map(_.getLong(1)).toSeq
    val sampled = OrderStats.sampledSplitters(data.toDF("key"), "key", 8, threshold = 1.0)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(sampled == exact)
  }

  test("sampledSplitters at threshold 0.5 lands near the exact splitters") {
    val data = (1L to 10000L)  // uniform: easy to bound the quantile error
    val sampled = OrderStats.sampledSplitters(data.toDF("key"), "key", 4, threshold = 0.5)
      .collect().sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    val exact = Seq(2500L, 5000L, 7500L)
    sampled.zip(exact).foreach { case (s, e) =>
      assert(math.abs(s - e) < 500, s"sampled $s too far from exact $e")
    }
  }

  for ((n, blocks) <- Seq((100, 8), (103, 4), (64, 64), (7, 3))) {
    test(s"blockStats n=$n blocks=$blocks matches brute force") {
      val data = Seq.fill(n)((rng.nextInt(100000).toLong, rng.nextInt(100).toLong))
        .zipWithIndex.map { case ((key, v), i) => (key * 1000 + i, v) } // unique keys
      val m = (n + blocks - 1) / blocks
      val expect = data.sortBy(_._1).grouped(m).zipWithIndex
        .map { case (g, b) => (b.toLong, g.size.toLong, g.map(_._2).sum) }.toSeq
      val got = OrderStats.blockStats(data.toDF("key", "v"), "key", "v", blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expect)
    }
  }
}

package graft

import graft.streaming.EventStreaming

/** The streaming Misra-Gries maintainer: exact when k holds every key,
  * honest interval bounds when it can't. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private def replay(keys: Seq[String], k: Int, chunks: Int): Map[String, (Long, Long)] =
    EventStreaming.topkReplay(keys.toDS(), k, chunks)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("k above the distinct-key count: exact under ANY chunking") {
    val keys = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val exact = Map("a" -> (40L, 40L), "b" -> (25L, 25L), "c" -> (3L, 3L))
    val rng = new scala.util.Random(61L)
    for (chunks <- Seq(1, 3, 7))
      assert(replay(rng.shuffle(keys), 8, chunks) == exact, s"chunks=$chunks")
  }

  test("decrement path: bounds hold and certified-heavy keys survive") {
    // 2 heavy keys (200 each) among 100 distinct rare keys, k = 5:
    // decrements must fire, every surviving counter obeys
    // counter <= true <= counter + dec, and any key with true > dec
    // is guaranteed present (the MG certificate)
    val rng = new scala.util.Random(67L)
    val keys = rng.shuffle(
      Seq.fill(200)("hot1") ++ Seq.fill(200)("hot2") ++
        (1 to 100).flatMap(i => Seq.fill(2)(s"rare$i")))
    val m = new EventStreaming.TopKMaintainer("key", 5)
    keys.grouped(150).foreach(chunk => m.absorb(chunk.toDF("key")))
    val (n, dec) = m.stats
    assert(n == keys.size.toLong)
    assert(dec > 0L, "the decrement path never fired — weak test data")
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = m.current(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((key, (lo, hi)) <- got) {
      assert(lo <= truth(key) && truth(key) <= hi,
        s"$key: true ${truth(key)} outside [$lo, $hi]")
      assert(hi == lo + dec)
    }
    for ((key, c) <- truth if c > dec)
      assert(got.contains(key), s"certified-heavy $key (count $c > dec $dec) evicted")
    assert(got.size <= 5, "summary exceeded k counters")
  }

  test("empty input yields an empty snapshot with the right schema") {
    val out = EventStreaming.topkReplay(spark.emptyDataset[String], 4, 3)
    assert(out.columns.toSeq == Seq("key", "cnt_lo", "cnt_hi"))
    assert(out.isEmpty)
  }

  test("null keys are ignored, not counted") {
    val m = new EventStreaming.TopKMaintainer("key", 4)
    m.absorb(Seq(Some("a"), None, Some("a"), None).toDF("key"))
    assert(m.stats._1 == 2L)
    assert(m.current(spark).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == Seq(("a", 2L)))
  }

  test("k is validated") {
    intercept[IllegalArgumentException] { new EventStreaming.TopKMaintainer("key", 0) }
    intercept[IllegalArgumentException] {
      EventStreaming.topkReplay(Seq("a").toDS(), 4, 0)
    }
  }
}

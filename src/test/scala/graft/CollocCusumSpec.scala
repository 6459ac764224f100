package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.text.Ngrams

/** [[Ngrams.collocations]] (PMI-lift word pairs) and
  * [[EventOps.cusumChangepoint]] (exact integer CUSUM argmax). */
class CollocCusumSpec extends SparkSpec {
  import spark.implicits._

  // ── collocations ──────────────────────────────────────────────────────

  test("lift fractions match the brute-force PMI definition") {
    val docs = Seq(
      (1L, "new york is big"), (2L, "new york wins"),
      (3L, "big apple is new"), (4L, "york new york")).toDF("doc_id", "text")
    val toks = docs.collect().flatMap(_.getString(1).split(" "))
    val n = toks.length.toLong
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = docs.collect().flatMap(r =>
      r.getString(1).split(" ").sliding(2).map(a => (a(0), a(1))))
    val cnt = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Ngrams.collocations(docs, minCount = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w1, w2, cp, c1, c2, num, den) =>
      assert(cp == cnt((w1, w2)) && cp >= 2L)
      assert(c1 == uni(w1) && c2 == uni(w2))
      assert(num == cp * n && den == c1 * c2)
    }
    // every pair at or above minCount is present
    assert(got.map(g => (g._1, g._2)).toSet ==
      cnt.filter(_._2 >= 2L).keySet)
    // "new york" is a bound pair: lift far above 1 (num > den)
    val ny = got.find(g => g._1 == "new" && g._2 == "york").get
    assert(ny._6 > ny._7)
  }

  test("minCount filters pairs, not unigram counts") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = Ngrams.collocations(docs, minCount = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(g => (g._1, g._2)).toSeq == Seq(("a", "b")))
    // unigram count of 'a' still counts the (a, c) doc's token
    assert(got.head._4 == 3L)
  }

  test("single-token and empty docs contribute no pairs but do count tokens") {
    val docs = Seq((1L, "x"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val got = Ngrams.collocations(docs, minCount = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (w1, _, cp, c1, _, num, _) = got.head
    assert(w1 == "x" && cp == 2L && c1 == 3L && num == 2L * 5L)
  }

  // ── cusumChangepoint ──────────────────────────────────────────────────

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("a planted level shift is found at the shift boundary") {
    // 10 days at 100 cents, then 10 days at 900: CUSUM argmax at day 9
    val rows = (0L until 10L).map(d => ("a", d, 1.0)) ++
      (10L until 20L).map(d => ("a", d, 9.0))
    val got = EventOps.cusumChangepoint(ev(rows))
      .as[(String, Long, Long, Long, Long, Long)].head()
    val (ty, n, total, cpBucket, cpIdx, dev) = got
    assert(ty == "a" && n == 20L && total == 10L * 100L + 10L * 900L)
    assert(cpBucket == 9L && cpIdx == 10L)
    // dev at t=10: n·C − t·T = 20·1000 − 10·10000 = −80000
    assert(dev == -80000L)
  }

  test("property: reported deviation is the maximum over all buckets") {
    val rnd = new scala.util.Random(23)
    val rows = for (ty <- Seq("a", "b"); d <- 0L until 30L)
      yield (ty, d, rnd.nextInt(500) / 100.0)
    val got = EventOps.cusumChangepoint(ev(rows))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byType = rows.groupBy(_._1)
    got.foreach { case (ty, n, total, cpBucket, cpIdx, dev) =>
      val daily = byType(ty).groupBy(_._2).view
        .mapValues(_.map(r => math.floor(r._3 * 100).toLong).sum)
        .toSeq.sortBy(_._1)
      assert(n == daily.size.toLong && total == daily.map(_._2).sum)
      val cums = daily.map(_._2).scanLeft(0L)(_ + _).tail
      val devs = cums.zipWithIndex.map { case (c, i) =>
        n * c - (i + 1).toLong * total
      }
      assert(math.abs(dev) == devs.map(math.abs).max)
      assert(dev == devs(cpIdx.toInt - 1))
      assert(cpBucket == daily(cpIdx.toInt - 1)._1)
    }
  }

  test("constant series: every interior dev is 0, earliest bucket wins") {
    val rows = (0L until 5L).map(d => ("a", d, 2.0))
    val got = EventOps.cusumChangepoint(ev(rows))
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got._6 == 0L && got._4 == 0L && got._5 == 1L)
  }

  test("types with a single bucket are omitted") {
    val rows = Seq(("one", 3L, 1.0), ("two", 0L, 1.0), ("two", 1L, 2.0))
    val got = EventOps.cusumChangepoint(ev(rows))
      .select("event_type").as[String].collect()
    assert(got.toSeq == Seq("two"))
  }
}

package graft

import graft.operators.{LongMonoid, SlidingAggregate}

/** Randomized brute-force oracle for the distributed sliding aggregate:
  * random datasets × window sizes × partition counts × all four monoids,
  * checked against an O(n·l) reference computation. Covers the window-
  * geometry edge cases the reference handles at SlidingAggregation.java:
  * 257-278 and 365-376 (l ≤ m, l > m, l spanning many blocks, l > n).
  */
class SlidingAggregatePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  private def bruteForce(sorted: Seq[(Long, Long)], l: Int, mon: LongMonoid): Seq[(Long, Long, Long)] =
    sorted.zipWithIndex.map { case ((k, _), i) =>
      val w0 = math.max(0, i - l + 1)
      val window = sorted.slice(w0, i + 1).map(t => mon.lift(t._2))
      (i.toLong, k, window.reduce(mon.combine))
    }

  private val cases = Seq(
    // (n, window, numParts)
    (1, 1, 1), (1, 5, 4), (7, 3, 4), (40, 1, 4), (40, 40, 4), (40, 100, 4),
    (103, 16, 4), (103, 79, 4), (103, 91, 4), (103, 103, 7),
    (200, 17, 3), (200, 64, 8), (317, 250, 5), (317, 316, 2), (100, 33, 1),
    // streaming-evaluator stress: numParts >> n/m (m = 1..2, windows span
    // many blocks), and numParts <= 0 (auto-derived from parallelism)
    (30, 7, 16), (30, 29, 16), (50, 50, 32), (64, 9, 64), (200, 83, 0),
  )

  for ((n, l, parts) <- cases; mon <- Seq(LongMonoid.Sum, LongMonoid.Count, LongMonoid.Min, LongMonoid.Max)) {
    test(s"n=$n l=$l parts=$parts agg=${mon.name} matches brute force") {
      // duplicate keys on purpose: key range is n/2 wide
      val data = Seq.fill(n)((rng.nextInt(math.max(1, n / 2)).toLong, rng.nextInt(2000).toLong - 1000L))
      // ties: brute force must see the same tie order Spark chooses, so sort
      // by (key, value) and make value a tiebreaker part of the key instead —
      // simplest: make keys unique by composing key*100000 + i
      val unique = data.zipWithIndex.map { case ((k, v), i) => (k * 100000 + i, v) }
      val sortedRef = unique.sortBy(_._1)
      val expected = bruteForce(sortedRef, l, mon)

      val df = unique.toDF("key", "value")
      val got = SlidingAggregate.scalable(df, "key", "value", l, parts, mon)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
      assert(got == expected)
    }
  }
}

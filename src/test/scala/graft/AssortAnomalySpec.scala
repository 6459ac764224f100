package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.events.EventOps
import graft.graph.Assortativity

/** [[Assortativity.degreeAssortativity]] and [[EventOps.rollingAnomaly]]. */
class AssortAnomalySpec extends SparkSpec {
  import spark.implicits._

  // ── assortativity ─────────────────────────────────────────────────────

  test("star graph: perfectly disassortative (r = -1 on 2 degree levels)") {
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = Assortativity.degreeAssortativity(edges, "a", "b").head
    assert(r.getLong(2) == 8L) // n = 2m
    def dec(i: Int) = BigInt(r.getDecimal(i).toBigInteger)
    val (cov, vx, vy) = (dec(8), dec(9), dec(10))
    assert(cov < 0 && cov * cov == vx * vy) // r² = 1, r = −1
  }

  test("property: sums match brute force; symmetry holds") {
    val rnd = new scala.util.Random(31)
    val raw = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    val canon = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val deg = (canon.map(_._1) ++ canon.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = canon.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val r = Assortativity.degreeAssortativity(raw.toDF("a", "b"), "a", "b").head
    assert(r.getLong(2) == pairs.size.toLong)
    assert(r.getLong(3) == pairs.map(_._1).sum)
    assert(r.getLong(3) == r.getLong(4))  // sum_x = sum_y by symmetry
    assert(r.getLong(5) == r.getLong(6))  // sum_xx = sum_yy
    assert(r.getLong(7) == pairs.map(p => p._1 * p._2).sum)
  }

  test("degreePairs canonicalizes: self-loops and reversed dups collapse") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L), (1L, 2L)).toDF("a", "b")
    val got = Assortativity.degreePairs(edges, "a", "b").collect()
    assert(got.length == 2) // one undirected edge × 2 orientations
    got.foreach(r => assert(r.getLong(2) == 1L && r.getLong(3) == 1L))
  }

  // ── rollingAnomaly ────────────────────────────────────────────────────

  private def ev(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((ty, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400000L), 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("a planted spike is flagged; steady days are not") {
    // 20 quiet days around 100 cents with mild noise, one 10000-cent spike
    val rnd = new scala.util.Random(5)
    val rows = (0L until 20L).map { d =>
      ("a", d, if (d == 15L) 100.0 else 1.0 + rnd.nextInt(10) / 100.0)
    }
    val got = EventOps.rollingAnomaly(ev(rows))
      .select("bucket", "is_anomaly").as[(Long, Long)].collect().toMap
    assert(got(15L) == 1L)
    assert(got.filter(_._1 != 15L).values.forall(_ == 0L))
  }

  test("property: moment forms and flag match brute force over the window") {
    val rnd = new scala.util.Random(41)
    val rows = for (ty <- Seq("a", "b"); d <- 0L until 25L)
      yield (ty, d, rnd.nextInt(1000) / 100.0)
    val got = EventOps.rollingAnomaly(ev(rows), window = 5, zTimes10 = 20)
      .collect()
    val daily = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(r => math.floor(r._3 * 100).toLong).sum).toMap
    got.foreach { r =>
      val (ty, b) = (r.getString(0), r.getLong(1))
      val win = (math.max(0L, b - 5) until b).flatMap(d => daily.get((ty, d)))
      val x = daily((ty, b))
      val n = win.size.toLong
      assert(r.getLong(2) == x && r.getLong(3) == n)
      if (win.isEmpty) {
        // no preceding buckets: sums are NULL, never flagged
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6)
          && r.isNullAt(7) && r.getLong(8) == 0L)
      } else {
        val (sw, ssw) = (win.sum, win.map(v => v * v).sum)
        assert(r.getLong(4) == sw && r.getLong(5) == ssw)
        val dev = n * x - sw
        val varn = n * ssw - sw * sw
        assert(r.getLong(6) == dev && r.getLong(7) == varn)
        val wantFlag = n >= 2 &&
          BigInt(dev) * dev * (n - 1) * 100 > BigInt(400) * varn * n
        assert(r.getLong(8) == (if (wantFlag) 1L else 0L), s"($ty, $b)")
      }
    }
  }

  test("a single preceding bucket (n_w = 1) is never flagged") {
    val rows = Seq(("a", 0L, 99.0), ("a", 1L, 5000.0))
    val got = EventOps.rollingAnomaly(ev(rows))
      .select("n_w", "is_anomaly").as[(Long, Long)].collect().toMap
    assert(got(0L) == 0L && got(1L) == 0L)
  }

  test("flag comparison is exact past Int64 (decimal path)") {
    // tiny baseline then a 1.7e9-cent spike: every BIGINT column stays
    // inside Int64 but dev² ≈ 1.16e19 passes it
    val rows = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 2L, 1.7e7))
    val got = EventOps.rollingAnomaly(ev(rows), window = 3, zTimes10 = 10)
      .select("bucket", "dev_num", "is_anomaly")
      .as[(Long, Option[Long], Long)]
      .collect().map(r => r._1 -> (r._2.getOrElse(0L), r._3)).toMap
    val dev2 = BigInt(got(2L)._1) * got(2L)._1
    assert(dev2 > BigInt(Long.MaxValue))
    assert(got(2L)._2 == 1L)
  }

  test("rejects invalid window and z arguments") {
    val df = ev(Seq(("a", 0L, 1.0)))
    intercept[IllegalArgumentException](EventOps.rollingAnomaly(df, window = 1))
    intercept[IllegalArgumentException](
      EventOps.rollingAnomaly(df, zTimes10 = 0))
    intercept[IllegalArgumentException](
      EventOps.rollingAnomaly(df, bucketUs = 0L))
  }
}

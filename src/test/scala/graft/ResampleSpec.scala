package graft

import org.apache.spark.sql.DataFrame

import graft.events.EventOps

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // events schema with ts as Long nanoseconds (nanosAsLong parquet shape)
  private def events(rows: (Long, Long, String, Double)*): DataFrame =
    rows.map { case (id, tsSec, et, v) => (id, tsSec * 1000000000L, et, v) }
      .toDF("event_id", "ts", "event_type", "value")

  test("densifies to the full grid, zero-fills counts, forward-fills sums") {
    // bucket = 10s; type a observes buckets 0 and 3, type b only bucket 2
    val out = EventOps.resample(events(
        (0L, 1L, "a", 1.00), (1L, 5L, "a", 2.00),  // a/bucket0: n=2 sum=300
        (2L, 35L, "a", 4.00),                      // a/bucket3: n=1 sum=400
        (3L, 25L, "b", 8.00)),                     // b/bucket2: n=1 sum=800
        bucketUs = 10000000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))
      .toMap
    // grid is [0, 3] for BOTH types (global bounds)
    assert(out.keySet == (for (t <- Seq("a", "b"); b <- 0L to 3L) yield (t, b)).toSet)
    assert(out(("a", 0L)) == ((2L, 300L, 300L)))
    assert(out(("a", 1L)) == ((0L, -1L, 300L))) // gap: n=0, sum null, ff carries
    assert(out(("a", 2L)) == ((0L, -1L, 300L)))
    assert(out(("a", 3L)) == ((1L, 400L, 400L)))
    assert(out(("b", 0L)) == ((0L, -1L, -1L))) // before first obs: ff null
    assert(out(("b", 1L)) == ((0L, -1L, -1L)))
    assert(out(("b", 2L)) == ((1L, 800L, 800L)))
    assert(out(("b", 3L)) == ((0L, -1L, 800L)))
  }

  test("grid size is span-bound, not data-bound, and covers every type") {
    // 1000 events in one bucket + 1 straggler 50 buckets later
    val rows = (0L until 1000L).map(i => (i, 1L, "x", 1.0)) :+
      (1000L, 505L, "y", 1.0)
    val out = EventOps.resample(events(rows: _*), bucketUs = 10000000L)
    assert(out.count() == 2 * 51) // 2 types x buckets [0, 50]
  }

  test("rejects a non-positive bucket") {
    intercept[IllegalArgumentException](
      EventOps.resample(events((0L, 1L, "a", 1.0)), bucketUs = 0L))
  }
}

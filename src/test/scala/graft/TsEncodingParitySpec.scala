package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.events.EventOps

/** The two shipped `events.ts` encodings — Long nanoseconds and
  * TIMESTAMP_NTZ microseconds — must be indistinguishable to every
  * event-time operator: same rows, same values, bit-for-bit. This is the
  * semantic half of the drift guard (TestdataCanarySpec pins the
  * contract; this spec pins the behavior). */
class TsEncodingParitySpec extends SparkSpec {

  // one deterministic event set, ~200 events over 20 users with gaps and
  // same-µs ties (the sessionize/asof tie-break paths)
  private def rows: Seq[(Long, Long, Long, Double)] = // (id, usec, user, value)
    (0L until 200L).map { i =>
      val user = i % 20
      val us = i / 20 * 90000000L + (i % 3) * 1000L + (if (i % 7 == 0) 0L else i)
      (i, us, user, (i % 100) / 7.0)
    }

  private def asLongNs: DataFrame = {
    import spark.implicits._
    rows.map { case (id, us, u, v) => (id, us * 1000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
  }

  private def asNtz: DataFrame = {
    import spark.implicits._
    val df = rows.toDF("event_id", "us", "user_id", "value")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("value"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    df
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("tsMicros itself agrees across encodings") {
    val a = collectSorted(asLongNs.select(col("event_id"), EventOps.tsMicros(asLongNs)))
    val b = collectSorted(asNtz.select(col("event_id"), EventOps.tsMicros(asNtz)))
    assert(a == b)
  }

  test("trailingWindow parity") {
    val a = collectSorted(EventOps.trailingWindow(asLongNs, windowSec = 120))
    val b = collectSorted(EventOps.trailingWindow(asNtz, windowSec = 120))
    assert(a == b && a.nonEmpty)
  }

  test("sessionize parity") {
    val a = collectSorted(EventOps.sessionize(asLongNs, gapSec = 60))
    val b = collectSorted(EventOps.sessionize(asNtz, gapSec = 60))
    assert(a == b && a.nonEmpty)
  }
}

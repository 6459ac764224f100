package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.SlidingAggregate
import graft.sources.TextKV

/** Golden-output parity with the reference (`/root/reference/test.sh`):
  * run the sliding aggregate on `input/simple103.txt` for window 16/79/91
  * with 4 partitions and compare (rank, key, agg) triples to the
  * concatenation of `expected{16,79,91}/part-r-*`.
  */
class SlidingAggregateGoldenSpec extends SparkSpec {
  private val refDir = "/root/reference"

  private def golden(window: Int): Seq[(Long, Long, Long)] = {
    val dir = Paths.get(s"$refDir/expected$window")
    Files.list(dir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-r-"))
      .sortBy(_.getFileName.toString)
      .flatMap(p => Files.readAllLines(p).asScala)
      .map { line =>
        val Array(r, k, a) = line.split("\t")
        (r.toLong, k.toLong, a.toLong)
      }
      .sortBy(_._1)
  }

  private def collect(dfRows: Array[org.apache.spark.sql.Row]): Seq[(Long, Long, Long)] =
    dfRows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)

  for (window <- Seq(16, 79, 91)) {
    test(s"scalable sliding SUM matches expected$window") {
      val in = TextKV.read(spark, s"$refDir/input/simple103.txt")
      val got = collect(
        SlidingAggregate.scalable(in, "key", "value", window, numParts = 4).collect())
      assert(got == golden(window))
    }

    test(s"sql sliding SUM matches expected$window") {
      val in = TextKV.read(spark, s"$refDir/input/simple103.txt")
      val got = collect(SlidingAggregate.sql(in, "key", "value", window).collect())
      assert(got == golden(window))
    }
  }

  test("tosort100 (all values 1): window SUM == window COUNT == min(rank+1, l)") {
    val in = TextKV.read(spark, s"$refDir/input/tosort100.txt")
    val got = collect(SlidingAggregate.scalable(in, "key", "value", 10, numParts = 4).collect())
    assert(got.size == 100)
    got.foreach { case (rank, _, agg) => assert(agg == math.min(rank + 1, 10L)) }
  }
}

package graft

import org.apache.spark.SparkException

import graft.operators.SlidingAggregate
import graft.sources.TextKV

/** Error-contract parity with the reference: malformed input crashes
  * (FAILFAST, like the reference's bare Integer.parseInt at
  * SlidingAggregation.java:49), and invalid parameters fail fast with
  * clear messages instead of computing garbage. */
class TextKVRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("malformed text KV lines fail the read (FAILFAST parity)") {
    val dir = java.nio.file.Files.createTempDirectory("textkv").toFile
    val f = new java.io.File(dir, "bad.txt")
    java.nio.file.Files.writeString(f.toPath, "1\t2\nnot-a-number\t3\n")
    val ex = intercept[SparkException] {
      TextKV.read(spark, f.getAbsolutePath).collect()
    }
    assert(ex.getMessage.contains("FAILED_READ_FILE"), ex.getMessage)
  }

  test("window < 1 is rejected") {
    val df = Seq((1L, 2L)).toDF("key", "value")
    val ex = intercept[IllegalArgumentException] {
      SlidingAggregate.scalable(df, "key", "value", window = 0, numParts = 2)
    }
    assert(ex.getMessage.contains("window"))
  }

  test("unknown aggregate name is a clear error on both paths") {
    val df = Seq((1L, 2L)).toDF("key", "value")
    assert(intercept[IllegalArgumentException] {
      SlidingAggregate.sql(df, "key", "value", 5, "median")
    }.getMessage.contains("unknown aggregate"))
    assert(intercept[IllegalArgumentException] {
      graft.operators.LongMonoid.byName("median")
    }.getMessage.contains("unknown aggregate"))
  }

  test("empty input yields an empty result, not a crash") {
    val df = Seq.empty[(Long, Long)].toDF("key", "value")
    assert(SlidingAggregate.scalable(df, "key", "value", 5, 4).count() == 0)
  }
}

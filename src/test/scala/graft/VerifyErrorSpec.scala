package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The round-8 failure mode, spec-gated: a gate that throws must leave a
  * visible trace in the verify artifact (errors.json + `<name>._ERROR`
  * marker), never silently shrink it, and must not take the surviving
  * gates down with it. */
class VerifyErrorSpec extends SparkSpec {

  test("a throwing gate yields an error record; healthy gates still dump") {
    import spark.implicits._
    val out = Files.createTempDirectory("verify_err").toString
    val errors = Verify.runGates(spark, "ignored-sf", out, Seq(
      "g_ok" -> ((s, _) => { import s.implicits._; Seq(1L, 2L).toDF("v") }),
      "g_boom" -> ((_, _) => throw new IllegalStateException("plan\nbroke\t!")),
      "g_ok2" -> ((s, _) => { import s.implicits._; Seq(3L).toDF("v") }),
    ))
    assert(errors.keySet == Set("g_boom"))
    assert(errors("g_boom").contains("IllegalStateException"))
    // marker file + errors.json both present and naming the gate
    assert(Files.exists(Paths.get(s"$out/g_boom._ERROR")))
    val errJson = Files.readString(Paths.get(s"$out/errors.json"))
    assert(errJson.contains("g_boom"))
    // control chars in the message are escaped — the driver's json.load
    // must not choke on a multiline Spark error
    assert(!errJson.contains("\n") || errJson.linesIterator.size == 1)
    // healthy gates wrote parquet despite the failure between them
    assert(spark.read.parquet(s"$out/g_ok").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.read.parquet(s"$out/g_ok2").as[Long].collect().toSet == Set(3L))
  }

  test("all-green run writes an EMPTY errors.json (artifact self-describes)") {
    val out = Files.createTempDirectory("verify_ok").toString
    val errors = Verify.runGates(spark, "ignored-sf", out, Seq(
      "g_ok" -> ((s, _) => { import s.implicits._; Seq(1L).toDF("v") })))
    assert(errors.isEmpty)
    assert(Files.readString(Paths.get(s"$out/errors.json")) == "{}")
  }
}

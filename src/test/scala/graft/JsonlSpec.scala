package graft

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("clean rows parse with the mandated schema; corrupt lines quarantine, not vanish") {
    val dir = write(Seq(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "ok"}""",
      """{broken json line""",
      """{"doc_id": "not a number", "text": "type clash"}"""))
    val df = Jsonl.read(spark, dir, schema)
    val clean = Jsonl.clean(df).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(clean.toSeq == Seq((1L, "hello world"), (2L, "ok")))
    val bad = Jsonl.corruptRecords(df).collect().map(_.getString(0))
    assert(bad.length == 2, s"expected 2 quarantined lines, got ${bad.toSeq}")
    assert(bad.exists(_.contains("{broken json line")))
  }

  test("failFast mode turns a bad line into a job failure") {
    val dir = write(Seq("""{"doc_id": 1, "text": "fine"}""", """{nope"""))
    val e = intercept[Exception] {
      Jsonl.read(spark, dir, schema, failFast = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("MALFORMED_RECORD") || m.contains("FAILFAST")), e.toString)
  }

  test("rejects a schema that collides with the internal corrupt column") {
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, "/tmp/nowhere", new StructType().add(Jsonl.corruptCol, StringType))
    }
  }
}

package graft

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.{Csv, Jsonl}

class CsvSpec extends SparkSpec {

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("clean rows parse with the mandated schema; malformed lines quarantine, not vanish") {
    val dir = write(Seq(
      "doc_id,text",
      "1,hello world",
      "2,\"quoted, with comma\"",
      "not_a_number,type clash"))
    val df = Csv.read(spark, dir, schema)
    val clean = Csv.clean(df).collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(clean.toSeq == Seq((1L, "hello world"), (2L, "quoted, with comma")))
    // the shared corrupt-column contract: Jsonl's quarantine works as-is
    val bad = Jsonl.corruptRecords(df).collect().map(_.getString(0))
    Jsonl.release(df)
    assert(bad.toSeq == Seq("not_a_number,type clash"))
  }

  test("failFast turns a malformed line into a job failure; delimiter is configurable") {
    val dir = write(Seq("doc_id\ttext", "1\tfine", "boom\tbad"))
    val e = intercept[Exception] {
      Csv.read(spark, dir, schema, delimiter = "\t", failFast = true).collect()
    }
    assert(e.getMessage != null)
    // NB not .count(): counting after clean() prunes the scan down to the
    // corrupt column alone, which Spark disallows on raw CSV/JSON scans —
    // materialize data columns instead
    val permissive = Csv.read(spark, dir, schema, delimiter = "\t")
    assert(Csv.clean(permissive).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("rejects a schema that collides with the internal corrupt column") {
    val bad = new StructType().add(Jsonl.corruptCol, StringType)
    intercept[IllegalArgumentException](Csv.read(spark, "/tmp/x", bad))
  }
}

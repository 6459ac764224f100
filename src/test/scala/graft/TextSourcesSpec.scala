package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Partitioned, Text}

/** [[Text]] (CSV / JSON-lines) and [[Partitioned]] layout. */
class TextSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_spec_$name"

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("v", LongType)))

  test("CSV round-trips values, NULLs and commas-in-quotes exactly") {
    val df = Seq((1L, "plain", Some(10L)), (2L, "a,b \"q\"", None),
      (3L, null.asInstanceOf[String], Some(-5L))).toDF("id", "s", "v")
    Text.saveCsv(df, tmp("csv"), numFiles = 2)
    val back = Text.readCsv(spark, tmp("csv"), schema)
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(back == Set((1L, Some("plain"), Some(10L)),
      (2L, Some("a,b \"q\""), None), (3L, None, Some(-5L))))
  }

  test("CSV FAILFAST raises on a malformed row instead of nulling it") {
    val dir = tmp("csv_bad")
    val f = new java.io.File(dir)
    f.mkdirs()
    val w = new java.io.PrintWriter(s"$dir/part-bad.csv")
    w.println("id,s,v"); w.println("1,ok,10"); w.println("notanumber,x,zz")
    w.close()
    val e = intercept[Exception](
      Text.readCsv(spark, dir, schema).collect())
    // Spark wraps the FAILFAST malformed-record error in FAILED_READ_FILE;
    // accept either the wrapper or the root cause, but it MUST raise
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ").toLowerCase
    assert(msgs.contains("malformed") || msgs.contains("failed_read_file"))
  }

  test("JSON-lines round-trips exactly, including NULL fields") {
    val df = Seq((1L, "a", Some(10L)), (2L, null.asInstanceOf[String], None))
      .toDF("id", "s", "v")
    Text.saveJsonl(df, tmp("jsonl"), numFiles = 1)
    val back = Text.readJsonl(spark, tmp("jsonl"), schema)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(back == Set((1L, Some("a"), Some(10L)), (2L, None, None)))
  }

  test("partitioned write prunes: the filtered scan reads ONLY its directory") {
    val df = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "C"))
      .toDF("id", "st")
    Partitioned.save(df, tmp("part"), "st")
    val scan = Partitioned.read(spark, tmp("part"))
      .filter(col("st") === "A")
    // mechanical pin: the executed files all live under st=A
    val files = scan.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("st=A")),
      s"scan read outside st=A: ${files.mkString(", ")}")
    // and the plan carries the partition filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("st"),
      "PartitionFilters missing from the scan")
    assert(scan.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("partitioned write emits one file per partition value, not tasks x values") {
    val df = (1L to 1000L).map(i => (i, s"P${i % 3}")).toDF("id", "st")
    Partitioned.save(df, tmp("part_files"), "st")
    val root = new java.io.File(tmp("part_files"))
    for (d <- root.listFiles().filter(_.isDirectory)) {
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${d.getName} has $n files — the tiny-file accident")
    }
  }
}

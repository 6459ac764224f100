package graft

import java.nio.file.Files

import graft.sources.Orc

class OrcSpec extends SparkSpec {
  import spark.implicits._

  test("round trip preserves values, types, and NULLs") {
    val dir = Files.createTempDirectory("graft_orc_spec").toString
    val df = Seq((1L, Some("a"), Some(10L)), (2L, None, Some(-5L)),
      (3L, Some("c"), None)).toDF("k", "s", "v")
    Orc.save(df, s"$dir/t")
    val back = Orc.read(spark, s"$dir/t")
    // nullability widens on any file read (ORC carries no NOT NULL, like
    // parquet) — names and types are the round-trip contract
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("numFiles pins the output file count (no tiny-file drift)") {
    val dir = Files.createTempDirectory("graft_orc_spec").toString
    Orc.save(spark.range(1000).toDF("id").repartition(13), s"$dir/t", numFiles = 3)
    val files = new java.io.File(s"$dir/t").listFiles()
      .filter(f => f.getName.endsWith(".orc") && !f.getName.startsWith("."))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    // pinned codec shows up in the writer's file naming
    assert(files.forall(_.getName.contains("zstd")),
      s"expected zstd-compressed files, got ${files.map(_.getName).mkString(",")}")
    assert(Orc.read(spark, s"$dir/t").count() == 1000)
  }
}

package graft

/** Continuous (suite-gated) version of [[PlantedTruthMain]]'s planted-
  * truth check for the quadratic-oracle gates: 3 cipher copies of the
  * sf0.001 corpus — small enough for every `sbt test`, same argument.
  * The decade-scale runs (10× sf0.01 = sf0.1 scale, 10× sf0.1 = sf1
  * scale) are the main's job and recorded in PLANS.md. */
class PlantedTruthSpec extends SparkSpec {

  test("q38/q56 on a cipher-copied corpus reproduce the shifted base output cell-exactly") {
    val baseDir = "/root/testdata/sf0.001"
    val copies = 3
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    assert(docs.filter(!org.apache.spark.sql.functions.col("text")
      .rlike("^[a-z ]*$")).count() == 0, "corpus left the cipher alphabet")

    val synthDir = java.nio.file.Files.createTempDirectory("plantedspec").toString
    PlantedTruthMain.cipherCopies(docs, copies).write.mode("overwrite")
      .parquet(s"$synthDir/documents.parquet")

    for ((gate, idCols) <- Seq("q38_dedup_clusters" -> Seq(0, 1),
                               "q56_chargram_jaccard" -> Seq(0, 1))) {
      val q = SparkEntry.queries(gate)
      val base = q(spark, baseDir).collect().map(_.toSeq).toSeq
      assert(base.nonEmpty, s"$gate: empty base output anchors nothing")
      val want = PlantedTruthMain.shiftedUnion(base, idCols, copies)
      val got = q(spark, synthDir).collect().map(_.toSeq).toSet
      assert(got == want, s"$gate: planted truth diverged — " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }
}

package graft

import graft.operators.Quality._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), "a", 10L),
    (Some(2L), "a", 20L),
    (Some(2L), "z", 30L),   // dup id, bad status
    (None, "b", 999L)       // null id, out of range
  ).toDF("id", "status", "v")

  test("hand example: every rule type reports its exact violation count") {
    val got = expectations(df, Seq(
      ExpectNotNull("id"), ExpectUnique("id"),
      ExpectAccepted("status", Seq("a", "b")), ExpectRange("v", 0L, 100L)))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("accepted_values", "status", 4L, 1L, false),
      ("not_null", "id", 4L, 1L, false),
      ("range", "v", 4L, 1L, false),
      ("unique", "id", 4L, 1L, false)))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "status")
    val got = expectations(clean, Seq(
      ExpectNotNull("id"), ExpectUnique("id"),
      ExpectAccepted("status", Seq("a", "b")), ExpectRange("id", 1L, 2L)))
    assert(got.filter("NOT pass").count() == 0)
    assert(got.count() == 4)
  }

  test("NULLs never violate accepted/range (three-valued semantics), " +
       "and unique counts only non-null extras") {
    val got = expectations(df, Seq(
      ExpectAccepted("status", Seq("a", "b", "z")),
      ExpectRange("id", 1L, 2L),   // the NULL id row must not violate
      ExpectUnique("v")))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got.forall(_._4 == 0L), got.toString)
  }

  test("rejects unknown columns, duplicate rules, and unsafe names") {
    intercept[IllegalArgumentException](
      expectations(df, Seq(ExpectNotNull("nope"))))
    intercept[IllegalArgumentException](
      expectations(df, Seq(ExpectRange("v", 0, 1), ExpectRange("v", 5, 9))))
    intercept[IllegalArgumentException](
      expectations(df.withColumnRenamed("v", "v'x"), Seq(ExpectNotNull("v'x"))))
    intercept[IllegalArgumentException](expectations(df, Seq.empty))
  }

  test("referential: orphans counted, null FKs never violate, duplicates count per row") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 2L).toDF("pk") // duplicate parent keys collapse
    val r = graft.operators.Quality.referential(child, "fk", parent, "pk")
      .collect()(0)
    assert((r.getString(0), r.getString(1)) == (("relationship", "fk")))
    assert((r.getLong(2), r.getLong(3), r.getBoolean(4)) == ((4L, 1L, false)))
    // fully-covered child passes; empty child passes vacuously
    val ok = graft.operators.Quality.referential(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk").collect()(0)
    assert(ok.getLong(3) == 0L && ok.getBoolean(4))
    val empty = graft.operators.Quality.referential(
      Seq.empty[Long].toDF("fk"), "fk", parent, "pk").collect()(0)
    assert((empty.getLong(2), empty.getLong(3), empty.getBoolean(4))
      == ((0L, 0L, true)))
    intercept[IllegalArgumentException](
      graft.operators.Quality.referential(child, "nope", parent, "pk"))
  }
}

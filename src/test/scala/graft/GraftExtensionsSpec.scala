package graft

import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** The extensions entry point must make the native functions available to
  * a pure-SQL session with no Scala-API register() call. */
class GraftExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=graft.GraftExtensions injects the native functions") {
    // materialize the shared session FIRST (it's lazy) — otherwise the
    // builder below would CREATE the shared session and the test would
    // compare a session against itself
    spark.range(1).count()
    // force a NEW SparkSession (same SparkContext) so the extensions
    // are actually applied — getOrCreate would return the shared one.
    // `spark.sql.extensions` is a STATIC conf read from the SparkContext,
    // so with a reused context the spec goes through withExtensions — the
    // same injection path the conf triggers on a fresh context. The
    // reflective instantiation proves the zero-arg-constructor contract
    // the conf loader requires.
    val ext = Class.forName("graft.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    ClassicSession.clearDefaultSession()
    ClassicSession.clearActiveSession()
    val s2 = ClassicSession.builder()
      .master("local[2]")
      .withExtensions(ext)
      .getOrCreate()
    try {
      assert(s2 ne spark, "builder returned the shared session — extensions never applied")
      val dot = s2.sql("SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L))")
        .collect()(0).getLong(0)
      assert(dot == 32L)
      val ic = s2.sql("SELECT sorted_intersect_count(array(1, 3, 5), array(3, 4, 5))")
        .collect()(0).getLong(0)
      assert(ic == 2L)
      val bpe = s2.sql("SELECT bpe_tokens('they', array('th', 'the'))")
        .collect()(0).getSeq[String](0)
      assert(bpe == Seq("the", "y"))
    } finally {
      val shared = spark.asInstanceOf[ClassicSession]
      ClassicSession.setDefaultSession(shared)
      ClassicSession.setActiveSession(shared)
    }
  }

  test("register() is idempotent and quiet on repeat calls") {
    graft.functions.DotProductLong.register(spark)
    graft.functions.DotProductLong.register(spark) // second call: no replace
    graft.functions.SortedIntersectCount.register(spark)
    graft.functions.SortedIntersectCount.register(spark)
    val v = spark.sql("SELECT dot_long(array(2L), array(21L))").collect()(0).getLong(0)
    assert(v == 42L)
  }
}

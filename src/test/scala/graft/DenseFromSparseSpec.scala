package graft

import org.apache.spark.sql.functions._

/** The native one-pass densify (r15 optimization: replaces the
  * map_from_entries + per-slot element_at composition in the sketch
  * families' sparse→dense reads) must agree with the old composition
  * cell-for-cell, including its edge semantics. */
class DenseFromSparseSpec extends SparkSpec {

  import org.apache.spark.sql.execution.GraftColumnBridge.{column => gc, expression => ge}

  private def dense(totalSlots: Int) = (entries: org.apache.spark.sql.Column) =>
    gc(graft.functions.DenseFromSparse(ge(entries), totalSlots))

  test("densify matches the map_from_entries composition cell-for-cell") {
    import spark.implicits._
    val sparse = Seq((1L, 0L, 5L), (1L, 3L, 7L), (2L, 1L, 9L))
      .toDF("g", "slot", "c")
    val entries = collect_list(struct(col("slot"), col("c")))
    val got = sparse.groupBy("g").agg(dense(4)(entries).as("v"))
      .orderBy("g").collect().map(_.getSeq[Long](1))
    val old = sparse.groupBy("g")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("c"))))
        .as("m"))
      .select(col("g"), transform(sequence(lit(0L), lit(3L)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("v"))
      .orderBy("g").collect().map(_.getSeq[Long](1))
    assert(got.toSeq.map(_.toSeq) == old.toSeq.map(_.toSeq))
    assert(got(0).toSeq == Seq(5L, 0L, 0L, 7L))
    assert(got(1).toSeq == Seq(0L, 9L, 0L, 0L))
  }

  test("empty group densifies to all zeros (global-sketch contract)") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("slot", "c")
    val entries = collect_list(struct(col("slot"), col("c")))
    val got = none.agg(dense(3)(entries).as("v")).collect()(0).getSeq[Long](0)
    assert(got.toSeq == Seq(0L, 0L, 0L))
  }

  test("out-of-range slots are ignored; duplicate slots raise") {
    import spark.implicits._
    val oor = Seq((0L, 2L), (99L, 8L), (-1L, 8L)).toDF("slot", "c")
    val entries = collect_list(struct(col("slot"), col("c")))
    val got = oor.agg(dense(2)(entries).as("v")).collect()(0).getSeq[Long](0)
    assert(got.toSeq == Seq(2L, 0L))
    val dup = Seq((1L, 2L), (1L, 3L)).toDF("slot", "c")
    val err = intercept[Exception] {
      dup.agg(dense(2)(entries).as("v")).collect()
    }
    assert(err.getMessage.contains("duplicate slot") ||
      String.valueOf(err.getCause).contains("duplicate slot"))
  }
}

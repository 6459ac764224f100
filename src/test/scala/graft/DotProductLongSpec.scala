package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProductLong

class DotProductLongSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long matches the HOF formulation exactly, including nulls") {
    DotProductLong.register(spark)
    val rng = new scala.util.Random(3L)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rng.nextInt(10000).toLong - 5000),
       Seq.fill(64)(rng.nextInt(10000).toLong - 5000))) :+
      ((null: Seq[Long]), Seq.fill(64)(1L))
    val df = rows.toDF("a", "b")
    val out = df.select(
      expr("dot_long(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("dot_long participates in whole-stage codegen") {
    DotProductLong.register(spark)
    // range-based input: a literal row would be constant-folded into a
    // LocalTableScan and never reach codegen
    val df = spark.range(100)
      .select(expr("array(id, id + 1)").as("a"), expr("array(2L, 3L)").as("b"))
      .select(expr("dot_long(a, b)").as("d"))
    assert(df.orderBy("d").collect()(0).getLong(0) == 3L) // id=0: 0*2 + 1*3
    // the '*' prefix marks the Project as inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_long"), plan)
  }
}

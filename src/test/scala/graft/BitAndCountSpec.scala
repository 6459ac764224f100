package graft

import org.apache.spark.sql.functions._

import graft.functions.BitAndCount

class BitAndCountSpec extends SparkSpec {
  import spark.implicits._

  test("bit_and_count matches the HOF formulation exactly, including nulls and ragged widths") {
    BitAndCount.register(spark)
    val rng = new scala.util.Random(7L)
    val rows = Seq.fill(200)(
      (Seq.fill(rng.nextInt(8) + 1)(rng.nextLong()),
       Seq.fill(rng.nextInt(8) + 1)(rng.nextLong()))) :+
      ((null: Seq[Long]), Seq.fill(4)(-1L))
    val df = rows.toDF("a", "b")
    // ragged widths: the kernel treats missing high words as zero, which
    // is the HOF zip_with over the SHORTER prefix
    val out = df.select(
      expr("bit_and_count(a, b)").as("native"),
      expr("""aggregate(
               slice(zip_with(a, b, (x, y) -> bit_count(x & y)),
                     1, least(size(a), size(b))),
               CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))""").as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("bit_and_count participates in whole-stage codegen") {
    BitAndCount.register(spark)
    val df = spark.range(100)
      .select(expr("array(id, 255L)").as("a"), expr("array(3L, 15L)").as("b"))
      .select(expr("bit_and_count(a, b)").as("c"))
    assert(df.orderBy("c").collect()(0).getLong(0) == 4L) // id=0: popcnt(0&3)+popcnt(255&15)=0+4
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [bit_and_count"), plan)
  }
}

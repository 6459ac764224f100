package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TableOps

class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("merge contract: state(A) ⊕ state(B) == state(A ∪ B), including " +
       "one-sided keys and NULL values") {
    val a = Seq((1L, Some(10L)), (1L, Some(20L)), (2L, Some(5L)),
      (4L, Option.empty[Long])).toDF("k", "x")
    val b = Seq((1L, Some(7L)), (3L, Some(9L)), (4L, Option.empty[Long]),
      (5L, Some(0L))).toDF("k", "x")
    val merged = TableOps.mergeAggStates(
      TableOps.aggState(a, "k", "x"), TableOps.aggState(b, "k", "x"), "k")
    val direct = TableOps.aggState(a.union(b), "k", "x")
    assert(canon(merged) == canon(direct))
    // the all-NULL key's state stays NULL-summed, not zero
    val k4 = merged.filter("k = 4").collect().head
    assert(k4.getLong(1) == 0L && k4.isNullAt(2) && k4.isNullAt(3))
  }

  test("property: random batches merge to the direct aggregate in any order") {
    val rnd = new scala.util.Random(5)
    val batches = Seq.fill(4)(
      Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "x"))
    val direct = TableOps.aggState(batches.reduce(_ union _), "k", "x")
    val fwd = batches.map(TableOps.aggState(_, "k", "x"))
      .reduce(TableOps.mergeAggStates(_, _, "k"))
    val rev = batches.reverse.map(TableOps.aggState(_, "k", "x"))
      .reduce(TableOps.mergeAggStates(_, _, "k"))
    assert(canon(fwd) == canon(direct))
    assert(canon(rev) == canon(direct))
  }

  test("rejects a frame that is not an aggState table") {
    val s = TableOps.aggState(Seq((1L, 2L)).toDF("k", "x"), "k", "x")
    val bad = Seq((1L, 2L)).toDF("k", "n")
    val e = intercept[IllegalArgumentException](
      TableOps.mergeAggStates(s, bad, "k"))
    assert(e.getMessage.contains("columns must be exactly"))
  }
}

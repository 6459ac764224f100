package graft

import graft.events.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 900L), (1L, 10L, 901L), (1L, 15L, 902L), (2L, 6L, 903L))
      .toDF("k", "t", "rid")
    val out = AsOf.backward(left, right, Seq("k"), "t", "lid", "rid", Seq("rid", "t"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))).toMap
    assert(out == Map(
      100L -> Some(901L), // t=10: right at t=10 included (backward inclusive)
      101L -> Some(902L), // t=20: latest right is t=15
      102L -> None,       // t=5: right for k=2 is at t=6, too late
      103L -> None))      // no right rows for k=3 at all
  }

  test("randomized parity with a brute-force oracle") {
    val rng = new scala.util.Random(99L)
    val l = Seq.fill(300)((rng.nextInt(10).toLong, rng.nextInt(1000).toLong, rng.nextLong())).distinct
      .zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
    val r = Seq.fill(300)((rng.nextInt(10).toLong, rng.nextInt(1000).toLong)).distinct
      .zipWithIndex.map { case ((k, t), i) => (k, t, (10000 + i).toLong) }
    val out = AsOf.backward(l.toDF("k", "t", "lid"), r.toDF("k", "t", "rid"),
        Seq("k"), "t", "lid", "rid", Seq("rid"))
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Long]))).toMap
    for ((k, t, lid) <- l) {
      val cands = r.filter(x => x._1 == k && x._2 <= t)
      // ties at the same time: the operator orders by (t, tag, tie); among
      // right rows at the max time the LAST by tiebreak (rid) wins
      val expect = if (cands.isEmpty) None
        else Some(cands.maxBy(x => (x._2, x._3))._3)
      assert(out(lid) == expect, s"k=$k t=$t")
    }
  }

  test("reserved internal columns are rejected on BOTH sides") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 900L)).toDF("k", "t", "rid")
    for (c <- Seq("_tag", "_tie", "_payload")) {
      val badL = left.withColumn(c, lit(0))
      intercept[IllegalArgumentException] {
        AsOf.backward(badL, right, Seq("k"), "t", "lid", "rid", Seq("rid"))
      }
      val badR = right.withColumn(c, lit(0))
      intercept[IllegalArgumentException] {
        AsOf.backward(left, badR, Seq("k"), "t", "lid", "rid", Seq("rid"))
      }
    }
  }
}

package graft

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def naive(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) => x2 > x && y2 > y }
    }.toSet

  test("hand example: the staircase, with ties surviving on both axes") {
    // frontier: (5,1), (3,4), (1,9); (3,4) has a tie twin (id 6) that
    // also survives (equal is not strict dominance); (2,2) dominated
    val pts = Seq((1L, 5L, 1L), (2L, 3L, 4L), (3L, 1L, 9L), (4L, 2L, 2L),
      (5L, 0L, 0L), (6L, 3L, 4L))
    val got = Skyline.pareto2d(pts.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 5L, 1L), (2L, 3L, 4L), (3L, 1L, 9L), (6L, 3L, 4L)))
  }

  test("property: matches the all-pairs dominance filter on random points") {
    val rnd = new scala.util.Random(13)
    val pts = (1 to 800).map(i =>
      (i.toLong, rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val got = Skyline.pareto2d(pts.toDF("id", "x", "y"), "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naive(pts))
  }

  test("NULL coordinates are dropped, extra columns pass through") {
    val df = Seq((1L, Some(5L), Some(1L), "a"), (2L, None, Some(9L), "b"),
      (3L, Some(1L), None, "c")).toDF("id", "x", "y", "tag")
    val got = Skyline.pareto2d(df, "x", "y").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getString(3) == "a")
  }

  test("rejects missing, non-BIGINT, or internal-prefixed columns") {
    val df = Seq((1L, 1.5)).toDF("x", "d")
    intercept[IllegalArgumentException](Skyline.pareto2d(df, "x", "nope"))
    intercept[IllegalArgumentException](Skyline.pareto2d(df, "x", "d"))
  }
}

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

  // ── 3-D ──────────────────────────────────────────────────────────────

  private def naive3(pts: Seq[(Long, Long, Long, Long)]): Set[(Long, Long, Long, Long)] =
    pts.filterNot { case (_, x, y, z) =>
      pts.exists { case (_, x2, y2, z2) => x2 > x && y2 > y && z2 > z }
    }.toSet

  test("3-D hand example: ties survive, strict dominance on all axes kills") {
    val pts = Seq(
      (1L, 5L, 5L, 5L), // frontier
      (2L, 4L, 4L, 4L), // dominated by 1 on all three
      (3L, 5L, 1L, 9L), // frontier (beats 1 on z, loses y — incomparable)
      (4L, 9L, 1L, 1L), // frontier (best x)
      (5L, 5L, 5L, 5L), // exact tie twin of 1 — both survive
      (6L, 4L, 5L, 5L)) // survives: nothing beats it on ALL axes (1/5 tie y,z)
    val got = Skyline.pareto3d(pts.toDF("id", "x", "y", "z"), "x", "y", "z")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == naive3(pts))
    assert(got.map(_._1) == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("3-D property: matches all-pairs dominance on random points, many partitions") {
    val rnd = new scala.util.Random(29)
    // small coordinate domain forces heavy x-ties ACROSS partition
    // boundaries and y/z ties inside equal-x runs
    val pts = (1 to 900).map(i => (i.toLong, rnd.nextInt(25).toLong,
      rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    for (parts <- Seq(1, 7)) {
      val got = Skyline.pareto3d(pts.toDF("id", "x", "y", "z"),
        "x", "y", "z", numParts = parts)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == naive3(pts), s"numParts=$parts")
    }
  }

  test("3-D anti-correlated plane (everything survives) and a dominated grid") {
    // x + y + z = 60: no point strictly beats another on all three
    val plane = (0L to 30L).map(i => (i, i, 30L - i, 30L))
      .map { case (id, a, b, c) => (id, a, b, c) }
    val gotPlane = Skyline.pareto3d(plane.toDF("id", "x", "y", "z"), "x", "y", "z")
      .count()
    assert(gotPlane == plane.size)
    // strict chain: only the top corner survives
    val chain = (1L to 50L).map(i => (i, i, i, i))
    val gotChain = Skyline.pareto3d(chain.toDF("id", "x", "y", "z"), "x", "y", "z")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotChain == Seq((50L, 50L, 50L, 50L)))
  }

  test("3-D NULLs dropped, extra columns pass through, validation") {
    val df = Seq((1L, Some(5L), Some(1L), Some(2L), "a"),
      (2L, None, Some(9L), Some(9L), "b"),
      (3L, Some(9L), Some(9L), None, "c")).toDF("id", "x", "y", "z", "tag")
    val got = Skyline.pareto3d(df, "x", "y", "z").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getString(4) == "a")
    intercept[IllegalArgumentException](Skyline.pareto3d(df, "x", "y", "y"))
    intercept[IllegalArgumentException](Skyline.pareto3d(df, "x", "y", "tag"))
  }

  test("3-D frontier budget: anti-correlated (y,z) takes the distributed sweep, benign stays on the driver path") {
    // pathological shape: y strictly increases while z strictly decreases
    // — EVERY point is a 2-D (y,z) maximum, so the per-partition frontiers
    // total O(n). A cap below that must NOT raise and must NOT collect:
    // the operator switches to the distributed second sweep and still
    // returns the exact answer
    val anti = (0L until 5000L).map(i => (i, i % 7, i, 5000L - i))
    val antiDf = anti.toDF("id", "x", "y", "z")
    val usedDist = new java.util.concurrent.atomic.AtomicBoolean(false)
    val gotAnti = Skyline.pareto3d(antiDf, "x", "y", "z",
        maxFrontierPoints = 1000L, usedDistributedOut = Some(usedDist))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(usedDist.get, "expected the distributed fallback path")
    assert(gotAnti == naive3(anti))
    // a cap that fits keeps the driver path and the same answer
    val usedDist2 = new java.util.concurrent.atomic.AtomicBoolean(true)
    assert(Skyline.pareto3d(antiDf, "x", "y", "z",
        usedDistributedOut = Some(usedDist2)).count() == naive3(anti).size)
    assert(!usedDist2.get, "default cap must keep the driver path here")
    // benign (correlated) data stays far inside the default budget: the
    // q212 gate shape — a strict chain collapses every prefix frontier
    // to one point, so even a TINY cap passes on the driver path
    val chain = (1L to 4000L).map(i => (i, i, i, i))
    val usedDist3 = new java.util.concurrent.atomic.AtomicBoolean(true)
    val got = Skyline.pareto3d(chain.toDF("id", "x", "y", "z"),
      "x", "y", "z", maxFrontierPoints = 64L,
      usedDistributedOut = Some(usedDist3))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((4000L, 4000L, 4000L, 4000L)))
    assert(!usedDist3.get)
  }

  test("3-D distributed sweep == all-pairs oracle on random points (forced fallback)") {
    // cap 0 forces the fallback for ANY nonempty input; heavy ties in all three
    // coordinates exercise the equal-x runs, the queries-before-inserts
    // tie rule at equal y, and the cross-y-partition Fenwick carry
    val rnd = new scala.util.Random(43)
    val pts = (1 to 900).map(i => (i.toLong, rnd.nextInt(25).toLong,
      rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    for (parts <- Seq(1, 7)) {
      val usedDist = new java.util.concurrent.atomic.AtomicBoolean(false)
      val got = Skyline.pareto3d(pts.toDF("id", "x", "y", "z"),
        "x", "y", "z", numParts = parts, maxFrontierPoints = 0L,
        usedDistributedOut = Some(usedDist))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(usedDist.get)
      assert(got == naive3(pts), s"numParts=$parts")
    }
  }

  test("3-D both paths agree on a mixed anti-correlated + dominated input") {
    // an anti-correlated plane (all survive) unioned with a strictly
    // dominated shadow copy (each shadow point sits below a plane point
    // on every axis) — the fallback must keep exactly the plane
    val n = 3000L
    val plane = (0L until n).map(i => (i, 50L + i % 13, i + 100L, n - i + 100L))
    val shadow = plane.map { case (id, x, y, z) => (id + n, x - 1, y - 1, z - 1) }
    val all = plane ++ shadow
    val df = all.toDF("id", "x", "y", "z")
    val usedDist = new java.util.concurrent.atomic.AtomicBoolean(false)
    val viaFallback = Skyline.pareto3d(df, "x", "y", "z",
        maxFrontierPoints = 100L, usedDistributedOut = Some(usedDist))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(usedDist.get)
    val viaDriver = Skyline.pareto3d(df, "x", "y", "z")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(viaFallback == viaDriver)
    assert(viaFallback == plane.toSet)
  }

  test("Frontier: staircase invariant, weak-dominance rejection, probe") {
    val f = new Skyline.Frontier
    f.insert(5L, 1L); f.insert(3L, 4L); f.insert(1L, 9L)
    assert(f.size == 3)
    f.insert(4L, 2L) // covered by... nothing ≥ (4,2)? (5,1) no, so inserted
    assert(f.size == 4)
    f.insert(4L, 0L) // weakly dominated by (4,2) — rejected
    assert(f.size == 4)
    f.insert(6L, 5L) // sweeps out (5,1), (3,4), (4,2)
    assert(f.size == 2 && f.toPairs.toSeq == Seq((1L, 9L), (6L, 5L)))
    assert(f.dominated(0L, 8L)) // (1,9) covers
    assert(!f.dominated(1L, 9L)) // equal is not strict
    assert(!f.dominated(6L, 0L)) // nothing above x=6
  }
}

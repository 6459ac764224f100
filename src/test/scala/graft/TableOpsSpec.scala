package graft

import graft.operators.TableOps
import org.apache.spark.sql.functions._

class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "v")
    val nw = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L))
      .toDF("k", "s", "v")
    val out = TableOps.snapshotDiff(old, nw, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff is exact on nulls (null-safe struct compare)") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val out = TableOps.snapshotDiff(old, nw, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // null == null is UNCHANGED (dropped); value -> null is CHANGED
    assert(out == Seq((2L, "changed")))
  }

  test("snapshotDiff rejects mismatched schemas and missing keys") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 2L)).toDF("k", "s", "extra")
    intercept[IllegalArgumentException](TableOps.snapshotDiff(a, b, "k"))
    intercept[IllegalArgumentException](TableOps.snapshotDiff(a, a, "nope"))
  }

  test("histogram bins by floor division, negatives land in the right bin") {
    val vals = Seq(-21L, -20L, -1L, 0L, 5L, 9L, 10L, 19L, 20L, 20L)
    val out = TableOps.histogram(vals.toDF("v"), "v", binWidth = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val expect = vals.groupBy(v => Math.floorDiv(v, 10L)).map { case (bin, vs) =>
      bin -> ((bin * 10L, vs.size.toLong, vs.min, vs.max, vs.sum))
    }
    assert(out == expect)
  }

  test("profile counts rows, nulls, and exact distincts per column") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, Some("a"), None),
      (3L, None, Some(2.5)),
      (4L, Some("b"), Some(1.5))).toDF("k", "s", "x")
    val out = TableOps.profile(df, Seq("k", "s", "x"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      "k" -> ((4L, 0L, 4L)),
      "s" -> ((4L, 1L, 2L)),
      "x" -> ((4L, 1L, 2L))))
  }

  test("applyChangelog: latest wins, upserts replace whole rows, deletes drop") {
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    val changes = Seq(
      (1L, 11L, "a1", "U", 1L),  // overwritten by seq 2
      (1L, 12L, "a2", "U", 2L),  // wins for key 1
      (2L, 0L, null, "D", 1L),   // key 2 deleted
      (4L, 40L, "d", "U", 1L))   // insert
      .toDF("k", "v", "s", "op", "seq")
    val out = TableOps.applyChangelog(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // output columns keep the BASE's order (k, v, s) — a caller writing
    // the merge back over the base positionally must not get shuffled cols
    assert(out == Seq((1L, 12L, "a2"), (3L, 30L, "c"), (4L, 40L, "d")))
  }

  test("applyChangelog preserves the base's column order, not sorted order") {
    // base order (k, z, a) — alphabetical would flip z/a
    val base = Seq((1L, 10L, "p")).toDF("k", "z", "a")
    val changes = Seq((1L, 11L, "q", "U", 1L)).toDF("k", "z", "a", "op", "seq")
    val out = TableOps.applyChangelog(base, changes, "k")
    assert(out.columns.toSeq == Seq("k", "z", "a"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      == Seq((1L, 11L, "q")))
  }

  test("applyChangelog: a delete then re-insert at a higher seq revives the key") {
    val base = Seq((1L, 10L)).toDF("k", "v")
    val changes = Seq((1L, 0L, "D", 1L), (1L, 99L, "U", 2L))
      .toDF("k", "v", "op", "seq")
    val out = TableOps.applyChangelog(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 99L)))
  }

  test("applyChangelog rejects a changelog with mismatched columns") {
    val base = Seq((1L, 10L)).toDF("k", "v")
    val bad = Seq((1L, "U", 1L)).toDF("k", "op", "seq") // missing v
    intercept[IllegalArgumentException](TableOps.applyChangelog(base, bad, "k"))
  }

  test("madPerGroup: exact lower-order-statistic median and MAD") {
    val df = Seq(("g", 1L), ("g", 3L), ("g", 7L), ("g", 100L),
      ("h", 5L), ("h", 5L)).toDF("grp", "x")
    val out = TableOps.madPerGroup(df, "grp", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // g: sorted (1,3,7,100), lower median = rank 2 -> 3;
    //    deviations (2,0,4,97) sorted (0,2,4,97), lower median -> 2.
    //    the outlier 100 moves neither statistic.
    assert(out == Map("g" -> ((4L, 3L, 2L)), "h" -> ((2L, 5L, 0L))))
  }

  test("applyChangelogs: delete-then-revive ACROSS batches, later batch always wins") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    // batch 1 deletes key 1 and bumps key 2; batch 2 revives key 1 and
    // deletes key 3; batch 3 bumps key 1 again — per-batch seqs restart
    // at 1, so ordering must come from batch position, not seq
    val b1 = Seq((1L, 0L, "D", 1L), (2L, 21L, "U", 1L)).toDF("k", "v", "op", "seq")
    val b2 = Seq((1L, 100L, "U", 1L), (3L, 0L, "D", 1L)).toDF("k", "v", "op", "seq")
    val b3 = Seq((1L, 101L, "U", 1L)).toDF("k", "v", "op", "seq")
    val out = TableOps.applyChangelogs(base, Seq(b1, b2, b3), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 101L), (2L, 21L)))
    // and the fold equals chaining applyChangelog by hand
    val manual = TableOps.applyChangelog(
      TableOps.applyChangelog(TableOps.applyChangelog(base, b1, "k"), b2, "k"),
      b3, "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == manual)
    graft.operators.Checkpoints.releaseAll()
  }

  test("applyChangelogs: plan and stats stay bounded across many batches") {
    // the StatsBarrier discipline: without per-batch lineage truncation a
    // 20-batch fold would nest 20 full-outer joins in one plan (and the
    // size estimate would compound); with it, every round's plan hangs
    // off one checkpoint leaf
    val base = Seq((1L, 10L)).toDF("k", "v")
    val batches = (1 to 20).map(i =>
      Seq((1L, 10L + i, "U", 1L)).toDF("k", "v", "op", "seq"))
    val out = TableOps.applyChangelogs(base, batches, "k")
    val bits = out.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    assert(bits <= 64, s"stats estimate grew to $bits bits")
    val planNodes = out.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes <= 10,
      s"final plan has $planNodes nodes — lineage is not being truncated")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 30L)))
    graft.operators.Checkpoints.releaseAll()
  }

  test("madPerGroup rejects column names that collide with internal names") {
    val df = Seq(("g", 1L)).toDF("med", "x")
    intercept[IllegalArgumentException](TableOps.madPerGroup(df, "med", "x"))
    val df2 = Seq(("g", 1L)).toDF("grp", "dev")
    intercept[IllegalArgumentException](TableOps.madPerGroup(df2, "grp", "dev"))
    val df3 = Seq(("g", 1L)).toDF("__g", "x")
    intercept[IllegalArgumentException](TableOps.madPerGroup(df3, "__g", "x"))
  }

  test("percentRanks: frequency-compressed exact competition ranks") {
    val df = Seq(("g", 10L), ("g", 10L), ("g", 20L), ("g", 30L),
      ("h", 5L)).toDF("grp", "v")
    val out = TableOps.percentRanks(df, "grp", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // g: 10 appears twice at rank_m1 0; 20 has 2 below; 30 has 3 below;
    // n_m1 = 3. Singleton group h: rank 0 of 0.
    assert(out == Map(
      ("g", 10L) -> ((2L, 0L, 3L)),
      ("g", 20L) -> ((1L, 2L, 3L)),
      ("g", 30L) -> ((1L, 3L, 3L)),
      ("h", 5L) -> ((1L, 0L, 0L))))
  }

  test("percentRanks rejects colliding column names") {
    val df = Seq(("g", 1L)).toDF("cnt", "v")
    intercept[IllegalArgumentException](TableOps.percentRanks(df, "cnt", "v"))
    val df2 = Seq(("g", 1L)).toDF("grp", "rank_m1")
    intercept[IllegalArgumentException](TableOps.percentRanks(df2, "grp", "rank_m1"))
  }

  test("linregStats: exact sufficient statistics and slope fraction") {
    // y = 3x + 7 exactly for group "g": slope_num/slope_den must be 3
    val pts = Seq(0L, 1L, 2L, 5L, 9L).map(x => ("g", x, 3 * x + 7)) ++
      Seq(("h", 1L, 10L), ("h", 2L, 5L)) // slope -5
    val out = TableOps.linregStats(pts.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    val (n, sx, sy, sxx, sxy, num, den) = out("g")
    assert((n, sx, sy) == ((5L, 17L, 86L)))
    assert(sxx == Seq(0L, 1L, 4L, 25L, 81L).sum)
    assert(sxy == Seq(0L, 1L, 2L, 5L, 9L).map(x => x * (3 * x + 7)).sum)
    assert(num == den * 3, s"slope must be exactly 3: $num/$den")
    val (_, _, _, _, _, num2, den2) = out("h")
    assert(num2 == -5 * den2, s"slope must be exactly -5: $num2/$den2")
  }

  test("profile rejects unknown and empty column lists") {
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException](TableOps.profile(df, Seq.empty))
    intercept[IllegalArgumentException](TableOps.profile(df, Seq("nope")))
  }

  test("zeroFloorBalance: closed form equals the sequential clamp fold") {
    // hand: deltas 5, -10, 3 → balances 5, 0, 3
    val hand = Seq(("a", 1L, 5L), ("a", 2L, -10L), ("a", 3L, 3L))
    val got = TableOps.zeroFloorBalance(hand.toDF("k", "o", "d"), "k", "o", "d")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 5L), (2L, 0L), (3L, 3L)))
    // property: random walks, multiple keys
    val rng = new scala.util.Random(97L)
    val rows = for (k <- Seq("x", "y", "z"); i <- 1 to 50)
      yield (k, i.toLong, rng.nextInt(21).toLong - 10L)
    val expect = rows.groupBy(_._1).flatMap { case (k, v) =>
      v.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, bal), (_, o, d)) =>
        (o, math.max(0L, bal + d))
      }.tail.map { case (o, bal) => (k, o) -> bal }
    }
    val all = TableOps.zeroFloorBalance(rows.toDF("k", "o", "d"), "k", "o", "d")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(all == expect)
    intercept[IllegalArgumentException](
      TableOps.zeroFloorBalance(hand.toDF("k", "o", "d"), "k", "k", "d"))
  }

  test("robustOutliers: MAD rule flags, zero-MAD group flags every deviation") {
    // group a: values 1..7 plus wild 100 → med 4 (lower), MAD from devs
    // {3,2,1,0,1,2,3,96} sorted {0,1,1,2,2,3,3,96} → lower median 2;
    // 3·MAD = 6 → only the 100 flags (dev 96)
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L).map(("a", _))
    // group b: constant 5 except one 6 → MAD 0 → the 6 flags (dev 1 > 0)
    val b = Seq(5L, 5L, 5L, 6L).map(("b", _))
    val got = TableOps.robustOutliers((a ++ b).toDF("g", "x"), "g", "x", 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 100L, 4L, 2L, 96L), ("b", 6L, 5L, 0L, 1L)))
  }

  test("robustOutliers keeps duplicate flagged rows and validates mult") {
    val rows = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 9L), ("g", 9L))
    val got = TableOps.robustOutliers(rows.toDF("g", "x"), "g", "x", 3L)
    assert(got.count() == 2L, "both 9s must flag") // med 1, MAD 0
    intercept[IllegalArgumentException](
      TableOps.robustOutliers(rows.toDF("g", "x"), "g", "x", 0L))
  }

  test("missingRanges finds closed gap intervals over distinct ids") {
    val ids = Seq(1L, 2L, 5L, 6L, 9L, 9L, 15L) // dup 9 collapses
    val got = TableOps.missingRanges(ids.map(Tuple1(_)).toDF("id"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 4L, 2L), (7L, 8L, 2L), (10L, 14L, 5L)))
  }

  test("missingRanges: dense and single-value inputs have no gaps; nulls drop") {
    assert(TableOps.missingRanges(
      Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id"), "id").isEmpty)
    assert(TableOps.missingRanges(
      Seq(Tuple1(Option(7L)), Tuple1(Option.empty[Long]))
        .toDF("id"), "id").isEmpty)
  }

  test("functionalDeps: holds, violation degree, and null exclusion") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "x"), (3L, Some("b"), "y"),
      (3L, Some("b"), "y"),                       // duplicate row: no effect
      (4L, Some("c"), "x"), (4L, Some("c"), "y"), // k=4 maps to 2 statuses
      (5L, None, "z"))                            // null determinant: excluded
    val got = TableOps.functionalDeps(df.toDF("k", "s", "v"),
        Seq(("k", "v"), ("s", "v"), ("v", "k")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("k", "v"))  == ((5L, 6L, 2L, 0L)))  // k=4 fans out; the
    // null-s row still counts here (nulls only exclude per-pair columns)
    assert(got(("s", "v"))  == ((3L, 4L, 2L, 0L)))  // c -> {x, y}
    assert(got(("v", "k"))  == ((3L, 6L, 3L, 0L)))  // x -> {1,2,4}
    val unique = TableOps.functionalDeps(
        Seq((1L, "a"), (2L, "b")).toDF("k", "s"), Seq(("k", "s")))
      .collect()(0)
    assert((unique.getLong(2), unique.getLong(5)) == ((2L, 1L)))
  }

  test("functionalDeps: an empty relation vacuously holds") {
    val got = TableOps.functionalDeps(
        Seq.empty[(Long, String)].toDF("k", "s"), Seq(("k", "s")))
      .collect()(0)
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5))
      == ((0L, 0L, 0L, 1L)))
  }

  test("functionalDeps rejects bad pairs") {
    val df = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException](TableOps.functionalDeps(df, Seq.empty))
    intercept[IllegalArgumentException](TableOps.functionalDeps(df, Seq(("k", "k"))))
    intercept[IllegalArgumentException](TableOps.functionalDeps(df, Seq(("k", "nope"))))
  }

  test("makeChangelog emits the minimal U/D batch") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val tgt = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 40L)).toDF("k", "s", "v")
    val got = TableOps.makeChangelog(base, tgt, "k", seq = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      (2L, "U", 5L, Some("B"), Some(20L)),   // changed
      (3L, "D", 5L, None, None),             // removed
      (4L, "U", 5L, Some("d"), Some(40L)))) // added
  }

  test("round-trip law: applyChangelog(base, makeChangelog(base, target)) == target") {
    val rng = new scala.util.Random(83L)
    val base = Seq.tabulate(60)(i => (i.toLong, rng.nextInt(5).toString, rng.nextInt(100).toLong))
    // random target: drop some, mutate some, add some — nulls included
    val target = base.filter(_ => rng.nextBoolean())
      .map { case (k, s, v) => if (rng.nextBoolean()) (k, null.asInstanceOf[String], v + 1) else (k, s, v) } ++
      Seq.tabulate(10)(i => (1000L + i, "new", i.toLong))
    val bDf = base.toDF("k", "s", "v")
    val tDf = target.toDF("k", "s", "v")
    val log = TableOps.makeChangelog(bDf, tDf, "k")
    val replayed = TableOps.applyChangelog(bDf, log, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(replayed == target.toSet)
  }

  test("makeChangelog null-safe compare: null == null is unchanged") {
    val base = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val tgt = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val got = TableOps.makeChangelog(base, tgt, "k").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L), "only key 2 changed")
  }

  test("makeChangelog rejects mismatched schemas and colliding names") {
    val a = Seq((1L, "x")).toDF("k", "s")
    intercept[IllegalArgumentException](
      TableOps.makeChangelog(a, Seq((1L, "x", 2L)).toDF("k", "s", "v"), "k"))
    intercept[IllegalArgumentException](
      TableOps.makeChangelog(Seq((1L, "x")).toDF("k", "op"),
        Seq((1L, "y")).toDF("k", "op"), "k"))
  }

  test("giniImpurity: exact fractions, pure group is 0, null labels are a class") {
    val rows = Seq(
      ("a", Some("x")), ("a", Some("x")), ("a", Some("y")),   // 3², Σc²=5
      ("b", Some("z")), ("b", Some("z")),                      // pure
      ("c", Some("x")), ("c", None))                           // null class
    val got = TableOps.giniImpurity(rows.toDF("g", "l"), "g", "l")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((3L, 4L, 9L)))   // 1 − 5/9 = 4/9
    assert(got("b") == ((2L, 0L, 4L)))   // pure
    assert(got("c") == ((2L, 2L, 4L)))   // {x, NULL} → 1 − 2/4
  }

  test("giniImpurity matches a plain-Scala computation on random data") {
    val rng = new scala.util.Random(41L)
    val rows = Seq.fill(300)((rng.nextInt(7).toString, rng.nextInt(5).toString))
    val expect = rows.groupBy(_._1).map { case (g, v) =>
      val n = v.size.toLong
      val ss = v.groupBy(_._2).values.map(c => c.size.toLong * c.size).sum
      g -> ((n, n * n - ss, n * n))
    }
    val got = TableOps.giniImpurity(rows.toDF("g", "l"), "g", "l")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("giniImpurity rejects colliding column names") {
    val df = Seq(("a", "x")).toDF("n", "l")
    intercept[IllegalArgumentException](TableOps.giniImpurity(df, "n", "l"))
    intercept[IllegalArgumentException](TableOps.giniImpurity(df, "l", "l"))
  }
}

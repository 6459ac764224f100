package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout contracts: the interleave is a bijection on the
  * declared domain with [[Layout.unzValue]] as its inverse, matches an
  * independent driver-side bit-interleave, groups aligned quadrants
  * contiguously (the locality property file pruning rides on), the
  * generated SQL form is the same function (executed by Spark SQL here;
  * DuckDB executes it in the q226 oracle), and [[Layout.cluster]]
  * produces non-overlapping per-partition z-ranges without changing the
  * row set. Domain violations RAISE — a silently wrapped coordinate
  * would land rows in far-away files and destroy the pruning. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(coords: Seq[Long], bits: Int): Long =
    (for {
      (v, i) <- coords.zipWithIndex
      b <- 0 until bits
    } yield ((v >> b) & 1L) << (b * coords.size + i)).sum

  test("zValue matches the driver-side interleave and unzValue inverts it") {
    val rng = new scala.util.Random(5L)
    val pts = Seq.fill(300)((rng.nextInt(1 << 21).toLong,
      rng.nextInt(1 << 21).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 21).as("z"))
      .withColumn("dx", Layout.unzValue(col("z"), 0, 2, 21))
      .withColumn("dy", Layout.unzValue(col("z"), 1, 2, 21))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == refZ(Seq(r.getLong(0), r.getLong(1)), 21))
      assert(r.getLong(3) == r.getLong(0) && r.getLong(4) == r.getLong(1))
    }
    // 3-D too (bits*dims still <= 62)
    val p3 = Seq((3L, 5L, 7L), (0L, 0L, 1023L)).toDF("x", "y", "w")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("w")), 10).as("z"))
      .collect().map(_.getLong(0))
    assert(p3(0) == refZ(Seq(3L, 5L, 7L), 10).toLong)
    assert(p3(1) == refZ(Seq(0L, 0L, 1023L), 10).toLong)
  }

  test("z order groups every aligned quadrant contiguously (locality)") {
    // full 8x8 grid at bits=3: sorting by z must place each aligned
    // 4x4 quadrant in one contiguous run of 16, each 2x2 sub-quadrant
    // in a contiguous run of 4 — the structural fact that makes a
    // contiguous file slice a tight rectangle
    val grid = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val sorted = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    for (run <- Seq(4, 16); chunk <- sorted.grouped(run)) {
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      val side = math.sqrt(run.toDouble).toLong
      assert(xs.max - xs.min == side - 1 && ys.max - ys.min == side - 1 &&
        xs.min % side == 0 && ys.min % side == 0,
        s"run=$run chunk not an aligned ${side}x$side square: ${chunk.toSeq}")
    }
  }

  test("zValueSql generates the same function (Spark SQL executes it here)") {
    val pts = Seq((17L, 33L), (0L, 0L), (1048575L, 524287L)).toDF("x", "y")
    pts.createOrReplaceTempView("zpts_view")
    val viaSql = spark.sql(
      s"SELECT CAST(${Layout.zValueSql(Seq("x", "y"), 21)} AS BIGINT) AS z " +
        "FROM zpts_view").collect().map(_.getLong(0))
    val viaCol = pts.select(Layout.zValue(Seq(col("x"), col("y")), 21))
      .collect().map(_.getLong(0))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("cluster: row set unchanged; per-partition z-ranges do not overlap") {
    val rng = new scala.util.Random(11L)
    val pts = Seq.fill(2000)((rng.nextInt(1024).toLong, rng.nextInt(1024).toLong))
    val df = pts.toDF("x", "y")
    val clustered = Layout.cluster(df, Seq("x", "y"), 10, numFiles = 8)
    assert(clustered.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == pts.sorted)
    val ranges = clustered
      .select(Layout.zValue(Seq(col("x"), col("y")), 10).as("z"),
        spark_partition_id().as("p"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"overlapping partition z-ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("domain violations RAISE; bad shapes rejected eagerly") {
    val df = Seq((5L, -1L)).toDF("x", "y")
    intercept[Exception](
      df.select(Layout.zValue(Seq(col("x"), col("y")), 4)).collect())
    val big = Seq((16L, 3L)).toDF("x", "y") // 16 >= 2^4
    intercept[Exception](
      big.select(Layout.zValue(Seq(col("x"), col("y")), 4)).collect())
    val nul = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
    intercept[Exception](
      nul.select(Layout.zValue(Seq(col("x"), col("y")), 4)).collect())
    intercept[IllegalArgumentException](Layout.zValue(Seq(col("x")), 4))
    intercept[IllegalArgumentException](
      Layout.zValue(Seq(col("x"), col("y")), 32)) // 64 > 62
    intercept[IllegalArgumentException](Layout.unzValue(col("z"), 2, 2, 4))
  }
}

package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the Z-order layout actually BUYS — row-group min/max
  * pruning under multi-column box predicates — against the same data in
  * the two layouts a warehouse otherwise ships: natural (ingest) order
  * and single-column sort. For each layout the probe reads every parquet
  * footer and counts the row groups whose [min, max] envelope on
  * (x = o_custkey, y = order day) intersects each box — exactly the
  * groups a stats-pruning scan must read — plus a wall-clock timed
  * filter+agg per layout. The interesting contrast is structural:
  * a single-column sort prunes tightly on ITS column and not at all on
  * the other; Z-order prunes on BOTH (each file a tight rectangle), at
  * the cost of looser per-column envelopes than the dedicated sort.
  *
  * Usage: Test/runMain graft.ZorderProbeMain [ordersDir]
  * (default /root/repo/target/ev100x/orders.parquet — build with
  * Ev10xSynthMain first). Results → PLANS.md.
  */
object ZorderProbeMain {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/target/ev100x/orders.parquet")
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/repo/target/zorder_probe"

    val o = spark.read.parquet(src)
      .select(col("o_orderkey"), col("o_custkey").as("x"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("y"),
        col("o_totalprice"))
    val (xMin, xMax, yMin, yMax) = {
      val r = o.agg(min("x"), max("x"), min("y"), max("y")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    println(s"domain: x [$xMin, $xMax], y [$yMin, $yMax]")

    // EQUAL-RESOLUTION quantization (the documented normalize-first
    // step): both dims scaled to 1024 buckets, so the interleave's top
    // bits alternate between dims and 64 range-files tile the plane
    // ~8×8. Raw unequal domains (x 14 bits, y 12 here) would make the
    // top z-bits x-dominated and halve the y-side pruning — measured in
    // an earlier run of this probe: a 10% y-slice read 52% of groups
    // vs ~countable-tile fractions after quantization.
    val oN = o.select(col("o_orderkey"),
      expr(s"((x - ${xMin}L) * 1024L) div ${xMax - xMin + 1}L").as("x"),
      expr(s"((y - ${yMin}L) * 1024L) div ${yMax - yMin + 1}L").as("y"),
      col("o_totalprice"))
    def write(df: DataFrame, name: String): String = {
      val p = s"$base/$name"
      df.write.mode("overwrite").parquet(p)
      p
    }
    val natural = write(oN.repartition(64), "natural")
    val linearX = write(oN.repartitionByRange(64, col("x"))
      .sortWithinPartitions("x"), "linear_x")
    val zordered = write(
      graft.operators.Layout.cluster(oN, Seq("x", "y"), 10, 64), "zorder")

    // per-row-group (min, max) envelopes of x and y from the footers
    def envelopes(dir: String): Seq[((Long, Long), (Long, Long), Long)] = {
      val conf = new Configuration()
      val fs = FileSystem.getLocal(conf)
      fs.listStatus(new Path(dir)).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .flatMap { st =>
          val rd = ParquetFileReader.open(
            HadoopInputFile.fromPath(st.getPath, conf))
          try {
            import scala.jdk.CollectionConverters._
            rd.getFooter.getBlocks.asScala.toSeq.map { b =>
              def mm(name: String): (Long, Long) = {
                val c = b.getColumns.asScala
                  .find(_.getPath.toDotString == name).get
                val s = c.getStatistics
                (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                  s.genericGetMax.asInstanceOf[java.lang.Long].longValue())
              }
              (mm("x"), mm("y"), b.getRowCount)
            }
          } finally rd.close()
        }
    }

    val layouts = Seq("natural" -> natural, "linear_x" -> linearX,
      "zorder" -> zordered)
    val envs = layouts.map { case (n, d) => n -> envelopes(d) }.toMap

    // boxes: (name, xLo, xHi, yLo, yHi) on the QUANTIZED [0, 1024)
    // domain — ~2% x-span × ~10% y-span box, ~10%×10% box, an x-only
    // slice, and the structural-win y-only slice
    val xs = 1023L; val ys = 1023L
    val boxes = Seq(
      ("box 2%x * 10%y", xs / 2, xs / 2 + xs / 50, ys / 2, ys / 2 + ys / 10),
      ("box 10%x * 10%y", xs / 4, xs / 4 + xs / 10, ys / 4, ys / 4 + ys / 10),
      ("x-only 2% slice", xs / 2, xs / 2 + xs / 50, 0L, ys),
      // the structural win: a y-constrained query the x-sort cannot
      // prune AT ALL, while every z-ordered file is y-tight too
      ("y-only 10% slice", 0L, xs, ys / 2, ys / 2 + ys / 10))

    for ((bn, xl, xh, yl, yh) <- boxes) {
      println(s"\n== $bn: x in [$xl,$xh], y in [$yl,$yh]")
      for ((name, env) <- layouts.map(_._1).map(n => n -> envs(n))) {
        val total = env.size
        val hit = env.filter { case ((x0, x1), (y0, y1), _) =>
          x1 >= xl && x0 <= xh && y1 >= yl && y0 <= yh }
        val rowsHit = hit.map(_._3).sum
        val rowsAll = env.map(_._3).sum
        println(f"$name%-10s row groups read ${hit.size}%3d/$total%3d " +
          f"(${100.0 * hit.size / total}%5.1f%%), rows scanned " +
          f"${100.0 * rowsHit / rowsAll}%5.1f%%")
      }
      // timed verification that the planner sees the same pruning
      for ((name, dir) <- layouts) {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(dir)
            .filter(col("x").between(xl, xh) && col("y").between(yl, yh))
            .agg(count(lit(1)), sum("o_totalprice")).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-10s scan+agg min ${times.min}%.2f s")
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.embed.Jl]] (r15): the 100 TB claim is that
  * (a) projection is one narrow map pass over the scan — linear in
  * rows, no exchange — and (b) the two-stage read ([[graft.embed.Jl
  * .jlTopK]]: shortlist in 16-dim JL space, exact rerank of the
  * shortlist only) beats the exact 64-dim scan ([[graft.embed
  * .Similarity.topkCosine]]) on the same candidates because the
  * broadcast-cross arithmetic drops 4× and the exact kernel runs on
  * |Q|·shortK rows instead of |Q|·|C|. Probes 1e5→1e6 candidates × 8
  * queries, both paths, same checksum action.
  *
  * Usage: Test/runMain graft.JlProbeMain [maxRowsLog10]
  */
object JlProbeMain {
  def main(args: Array[String]): Unit = {
    val maxLog = if (args.length > 0) args(0).toInt else 6
    val spark = Sessions.tuned(SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    def vecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        d => (pmod(xxhash64(col("id") * 64L + d), lit(2000L)) - 1000L)
          .cast("float") / 1000.0f).as("embedding"))

    for (log <- Seq(5, maxLog).distinct.sorted) {
      val n = math.pow(10, log).toLong
      val cands = vecs(n).localCheckpoint()
      val queries = vecs(64).localCheckpoint()
      // XOR, not SUM: an ANSI Long sum of 64-bit hashes overflows (the
      // Bench.scala checksum rule)
      def checksum(df: org.apache.spark.sql.DataFrame): Long =
        df.select(expr(
          "bit_xor(xxhash64(q_id, rn, cand_id, score))")).head().getLong(0)
      // the ingest-side cost in isolation: ONE projection pass over the
      // candidates (at 100 TB this runs once and is stored; jlTopK
      // below re-runs it inline, so jlSec is the UNAMORTIZED worst case)
      val tp = System.nanoTime()
      graft.embed.Jl.project(cands, "vec_id", "embedding")
        .select(expr("bit_xor(xxhash64(jl))")).head()
      val projSec = (System.nanoTime() - tp) / 1e9
      val t0 = System.nanoTime()
      val exact = checksum(graft.embed.Similarity.topkCosine(
        queries, cands, k = 10))
      val exactSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val jl = checksum(graft.embed.Jl.jlTopK(
        queries, cands, k = 10, shortK = 100))
      val jlSec = (System.nanoTime() - t1) / 1e9
      println(f"JL twostage cands=1e$log |Q|=64 projSec=$projSec%6.2f " +
        f"exactSec=$exactSec%7.2f jlSec=$jlSec%7.2f " +
        f"speedup=${exactSec / jlSec}%5.2fx " +
        f"amortized=${exactSec / (jlSec - projSec)}%5.2fx " +
        f"(ck ${if (exact == jl) "EQUAL" else "differ — recall<1, expected"})")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

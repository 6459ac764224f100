package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Kept diagnostic for optimization rounds: q38 breakdown — edge
  * generation vs connected-components rounds, 3 warm reps. Pair with
  * GRAFT_CC_DEBUG=1 for per-round label sums and wall times.
  * GRAFT_CC_EDGES=ppjoin swaps the edge generator to the PPJoin form —
  * the regime-map probe for constructions whose VOCABULARY grows with
  * the corpus (the bitmap form's size-band blocking goes quadratic
  * there; PPJoin's rare-token prefixes keep filtering). */
object CcProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val edges = (if (sys.env.get("GRAFT_CC_EDGES").contains("ppjoin"))
          graft.text.Dedup.jaccardPairs(docs, num = 19, den = 20)
        else
          graft.text.Dedup.jaccardPairsBitmapBlocked(docs, num = 19, den = 20))
        .select("doc_a", "doc_b")
      val ne = edges.count()
      val t1 = System.nanoTime()
      // SAME-SESSION A/B (cross-session timings are not comparable):
      // jump rounds vs big-star/small-star alternation (Kiveris et al.),
      // interleaved per rep, output-signature-checked against each other
      val cl = graft.text.Dedup.clusters(docs.select("doc_id"), edges, maxIter = 50)
      val sig = cl.select(bit_xor(xxhash64(col("doc_id"), col("cluster"))))
        .collect()(0).getLong(0)
      val t2 = System.nanoTime()
      val cl2 = graft.text.Dedup.clustersStars(docs.select("doc_id"), edges, maxIter = 50)
      val sig2 = cl2.select(bit_xor(xxhash64(col("doc_id"), col("cluster"))))
        .collect()(0).getLong(0)
      val t3 = System.nanoTime()
      require(sig == sig2, s"CC algorithms disagree: jump=$sig stars=$sig2")
      println(f"REP$rep edges=$ne edgeSec=${(t1 - t0) / 1e9}%.2f " +
        f"jumpSec=${(t2 - t1) / 1e9}%.2f starsSec=${(t3 - t2) / 1e9}%.2f sig=$sig")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.embed.{Pq, Similarity}

/** Vector-family scaling probe for PLANS.md: the driver's embeddings
  * tables top out at 2,000 rows (sf0.1), so the ANN/PQ gates measure
  * fixed overhead, not growth. This main synthesizes a deterministic
  * clustered corpus at 10× and 100× that size and times the three search
  * paths head-to-head at fixed |Q| = 20, k = 10:
  *
  *   - exact  `Similarity.topkCosine`          (O(n·|Q|) baseline)
  *   - IVF    `Similarity.ivfTopkCosine`       (probed-fraction pruning)
  *   - IVFADC `Pq.ivfTopkAdc`                  (pruning + residual codes)
  *
  * Construction: 64-dim, 200 fixed cluster centers on a seeded integer
  * lattice, members = center + small seeded jitter — vectors arrive from
  * a deterministic generator (no RNG state across partitions: value =
  * xxhash64-mixed function of (vec_id, dim)), so reruns are identical.
  *
  * Usage: Test/runMain graft.VecScaleProbeMain [sizes...]
  */
object VecScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20000, 200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    val dim = 64
    val nClusters = 200
    // deterministic pseudo-vector: center(c)[d] in [-500, 500] from a hash
    // of (c, d); member jitter in [-20, 20] from a hash of (vec_id, d),
    // scaled to float via /1000. NOTE: float32 representation error means
    // quantize's floor(x·1000) can land one BELOW the synthesized integer
    // (0.7f = 0.69999998… → 699) — identical on every run, so fine for a
    // timing probe, but do NOT reuse this generator for value-checked
    // oracle fixtures expecting the exact lattice.
    def vectors(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dim - 1}), d ->
          CAST((CAST(xxhash64(id % $nClusters, d) % 500 AS DOUBLE) +
                CAST(xxhash64(id, d, 7L) % 20 AS DOUBLE)) / 1000.0 AS FLOAT))""")
          .as("embedding"))

    // Each path runs END-TO-END (index build + query), at two query-set
    // sizes: the |Q|=20 vs |Q|=500 DELTA isolates the per-query marginal
    // cost (the number that matters once the index amortizes), while the
    // |Q|=20 time shows the one-shot build floor.
    for (n <- sizes; nq <- Seq(20, 500)) {
      val cands = vectors(n).cache(); cands.count()
      val queries = vectors(n).filter(col("vec_id") < nq)
        .select(col("vec_id") + 1000000000L as "vec_id", col("embedding"))
      val nCells = math.max(16, math.sqrt(n.toDouble).toInt / 2)
      def time(label: String)(body: => Long): Unit =
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val rows = body
          println(f"PROBE n=$n nq=$nq $label rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
          graft.operators.Checkpoints.releaseAll()
        }
      time("exact_topk")(
        Similarity.topkCosine(queries, cands, k = 10).count())
      time(s"ivf_topk(nCells=$nCells,nProbe=4)")(
        Similarity.ivfTopkCosine(queries, cands, k = 10,
          nCells = nCells, nProbe = 4).count())
      time(s"ivfadc(nCells=$nCells,nProbe=4,m=8,k=16)")(
        Pq.ivfTopkAdc(queries, cands, k = 10, nCells = nCells, nProbe = 4,
          m = 8, kCodes = 16).count())
      cands.unpersist()
    }
    spark.stop()
  }
}

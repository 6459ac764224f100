package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the graph operators (PageRank ±weights, Triangles,
  * KCore, BFS) on synthetic hub-skewed graphs — the decade-scaling
  * evidence PLANS.md records for every operator family, now with
  * per-operator SHUFFLE BYTES so the "per-round exchange is the O(nodes)
  * label table" claim is measured, not asserted.
  *
  * Graph: m hash-derived edges over n = m/10 nodes; 10% of endpoints
  * collapse onto 10 hub nodes (so the biggest hubs carry ~m/100 edges
  * each — the power-law head that breaks id-ordered triangle joins and
  * skew-naive rank contributions). Deterministic (xxhash64 of the edge
  * id), no RNG state.
  *
  * Usage: Test/runMain graft.GraphProbeMain [edgesPerDecade...]
  *        (default: 1000000 10000000)
  *        GRAFT_PROBE_REPS=1 for the big decades (default 3);
  *        SPARK_DRIVER_MEM=64g for the 100M-edge decade.
  */
object GraphProbeMain {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()

    // cumulative shuffle-write bytes across all completed stages; the
    // per-operator delta (after a settle wait for the async bus) is the
    // operator's total exchange volume
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })
    def settledShuffle(): Long = {
      var last = -1L; var cur = shuffleBytes.get; var spins = 0
      while (cur != last && spins < 20) {
        last = cur; Thread.sleep(300); cur = shuffleBytes.get; spins += 1
      }
      cur
    }

    for (m <- sizes; rep <- 1 to reps) {
      val n = m / 10
      def endpoint(salt: Int) = {
        val h = s"xxhash64(id, $salt)"
        // 10% hub mass on nodes 0..9, the rest uniform
        expr(s"CASE WHEN pmod(xxhash64(id, ${salt + 100}), 10) = 0 " +
          s"THEN pmod($h, 10) ELSE pmod($h, ${n}L) END")
      }
      val edges = spark.range(m)
        .select(endpoint(1).as("s"), endpoint(2).as("d"))
        .filter(col("s") =!= col("d"))
      edges.write.mode("overwrite").parquet("/root/repo/target/graphprobe")
      val e = spark.read.parquet("/root/repo/target/graphprobe")
      val ew = e.withColumn("w", expr("1L + pmod(xxhash64(s, d), 9)"))

      def gb(x: Long) = f"${x / 1e9}%.2f"
      // GRAFT_PROBE_OPS=hits,ppr,lpred runs only those steps — the big
      // decades are expensive enough that re-probing the whole family to
      // measure one new operator would waste an hour of machine time
      val onlyOps = sys.env.get("GRAFT_PROBE_OPS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      var mark = settledShuffle()
      def step(label: String)(body: => Long): (Double, Long, String) = {
        if (onlyOps.exists(!_.contains(label)))
          return (0.0, 0L, f"${label}Sec=skip")
        val t0 = System.nanoTime()
        val v = body
        val sec = (System.nanoTime() - t0) / 1e9
        val now = settledShuffle()
        val delta = now - mark
        mark = now
        graft.operators.Checkpoints.releaseAll()
        spark.catalog.clearCache(); System.gc()
        (sec, v, f"${label}Sec=$sec%.2f ${label}ShufGB=${gb(delta)}")
      }

      val (_, prSig, prLine) = step("pr") {
        graft.graph.PageRank.pageRank(e, "s", "d", iterations = 3)
          .select(bit_xor(xxhash64(col("node"), col("rank"))))
          .collect()(0).getLong(0)
      }
      val (_, wprSig, wprLine) = step("wpr") {
        graft.graph.PageRank.pageRank(ew, "s", "d", iterations = 3,
            weightCol = Some("w"))
          .select(bit_xor(xxhash64(col("node"), col("rank"))))
          .collect()(0).getLong(0)
      }
      val (_, nTri, triLine) = step("tri") {
        graft.graph.Triangles.triangles(e, "s", "d").count()
      }
      val (_, nCore, coreLine) = step("core") {
        graft.graph.KCore.kCore(e, "s", "d", k = 8, maxPeels = 5).count()
      }
      val (_, nReach, bfsLine) = step("bfs") {
        val seeds = spark.range(10).select(col("id").as("n")) // the 10 hubs
        graft.graph.Bfs.hopDistance(e, "s", "d", seeds, "n", maxHops = 3).count()
      }
      val (_, lpSig, lpLine) = step("lp") {
        graft.graph.LabelProp.labelPropagation(e, "s", "d", rounds = 3)
          .select(bit_xor(xxhash64(col("node"), col("label"))))
          .collect()(0).getLong(0)
      }
      val (_, hitsSig, hitsLine) = step("hits") {
        graft.graph.Hits.hits(e, "s", "d", iterations = 2)
          .select(bit_xor(xxhash64(col("node"), col("hub"), col("auth"))))
          .collect()(0).getLong(0)
      }
      val (_, pprSig, pprLine) = step("ppr") {
        val seeds = spark.range(10).select(col("id").as("n")) // the 10 hubs
        graft.graph.PageRank.personalizedPageRank(e, "s", "d", seeds, "n",
            iterations = 3)
          .select(bit_xor(xxhash64(col("node"), col("rank"))))
          .collect()(0).getLong(0)
      }
      val (_, nPred, lpredLine) = step("lpred") {
        graft.graph.LinkPredict.commonNeighbors(e, "s", "d",
          maxDegree = 20, minCommon = 2L).count()
      }
      // warm-start maintenance (the q213/q214 shape at probe scale): the
      // timed step is ONLY the warm re-rank of a 1%-delta'd edge set
      // seeded with cold ranks computed (and materialized — the rounds
      // run eagerly) outside the timer; wRounds prints separately
      val wRounds = new java.util.concurrent.atomic.AtomicInteger(-1)
      val warmReady = if (onlyOps.exists(!_.contains("wstart"))) None else {
        val cold = graft.graph.PageRank.pageRank(e, "s", "d", iterations = 3)
        val dE = e.union(spark.range(m / 100).select(
          expr(s"pmod(xxhash64(id, 7), ${n}L)").as("s"),
          (lit(n) + expr(s"pmod(xxhash64(id, 8), ${math.max(n / 100L, 1L)}L)"))
            .as("d")))
        mark = settledShuffle() // cold run + fixture cost is NOT the step's
        Some((cold, dE))
      }
      val (_, wsSig, wsLine) = step("wstart") {
        val (cold, dE) = warmReady.get
        graft.graph.PageRank.pageRank(dE, "s", "d", iterations = 3,
            prior = Some(cold), roundsOut = Some(wRounds))
          .select(bit_xor(xxhash64(col("node"), col("rank"))))
          .collect()(0).getLong(0)
      }
      // the wstart baseline: COLD re-rank of the SAME delta'd edge set at
      // the same round count — isolates what the prior seed itself costs
      val (_, wcSig, wcLine) = step("wcold") {
        val dE = e.union(spark.range(m / 100).select(
          expr(s"pmod(xxhash64(id, 7), ${n}L)").as("s"),
          (lit(n) + expr(s"pmod(xxhash64(id, 8), ${math.max(n / 100L, 1L)}L)"))
            .as("d")))
        graft.graph.PageRank.pageRank(dE, "s", "d", iterations = 3)
          .select(bit_xor(xxhash64(col("node"), col("rank"))))
          .collect()(0).getLong(0)
      }
      println(s"GRAPH m=$m rep$rep $prLine $wprLine $triLine $coreLine " +
        s"$bfsLine $lpLine $hitsLine $pprLine $lpredLine $wsLine $wcLine " +
        s"nTri=$nTri nCore=$nCore nReach=$nReach nPred=$nPred " +
        s"prSig=$prSig wprSig=$wprSig lpSig=$lpSig hitsSig=$hitsSig " +
        s"pprSig=$pprSig wsSig=$wsSig wcSig=$wcSig wRounds=${wRounds.get}")
    }
    spark.stop()
  }
}

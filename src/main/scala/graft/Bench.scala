package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line and mirrors it to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `BENCH.json` in the cwd) so the driver
  * can parse it even when sbt log noise surrounds stdout.
  *
  * The action is a full-row checksum — `bit_xor(xxhash64(*))` — not
  * `.count()`: counting lets Catalyst prune every computed column (and
  * eliminate sorts under aggregation), which under-measures compute-heavy
  * queries. The checksum forces every output cell to materialize (xor, not
  * sum: ANSI mode makes a Long sum of hashes overflow). Failures propagate:
  * a broken query must fail the bench, not look fast.
  *
  * Measurement hygiene (r5's sliding-family "regression" was load noise —
  * run totals 74 s vs 46 s at load_avg 3.9):
  *  - IDLE GATE: before measuring, wait (bounded) for the system load to
  *    drop below `SPARK_GRAFT_LOAD_GATE` (default 2.0) so co-tenant load
  *    can't masquerade as a code regression; the wait and the load before
  *    and after are recorded in `env`.
  *  - ≥3 measured passes (`SPARK_GRAFT_BENCH_RUNS`, default 3), per-query
  *    MIN reported; per-run totals, per-run load, and the run-total spread
  *    land in `env` so a noisy artifact is self-describing.
  *  - Between queries, cached frames are dropped and a GC is requested so
  *    checkpointed blocks from one query (ContextCleaner frees them once
  *    the frame is unreachable) can't bleed block-manager pressure into
  *    the next query's timing.
  */
object Bench {
  /** Between-queries cleanup, OUTSIDE the timed span: drop cached frames,
    * free every checkpoint the query's operators created (deterministic
    * via [[graft.operators.Checkpoints.releaseAll]] — not at the GC's
    * mercy), and nudge the ContextCleaner, so one query's blocks can't
    * pressure the next query's timing. Leaves `Checkpoints.liveCount == 0`
    * (spec-gated in `CheckpointsSpec`). */
  def interQueryCleanup(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    graft.operators.Checkpoints.releaseAll()
    System.gc()
  }

  /** Spin-calibration probe: a FIXED quantum of single-threaded integer
    * work (xorshift64, `spinIters` rounds). Its wall time is a direct
    * read of host CPU availability that — unlike loadavg or the in-guest
    * CPU share — sees HYPERVISOR co-tenancy: on a quiet host it is a
    * per-machine constant, and any inflation of the probe is exactly the
    * inflation a measured query suffers. It is probed at bench start and
    * before/after every measured run, recorded per-run in the artifact,
    * and gates each run (relative to the best probe seen), so a
    * contended artifact identifies ITSELF: the r10 official bench was
    * ~1.29× inflated by host co-tenancy invisible to loadavg 0.19. */
  val spinIters = 300000000L
  def spinProbeSec(): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < spinIters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 0L) System.err.println("unreachable") // keep the loop live
    dt
  }

  /** ALL-CORES spin probe: every hardware thread runs the full serial
    * quantum concurrently, so the wall time equals the serial probe's
    * (~constant) when the hypervisor actually delivers all cores and
    * degrades in proportion to whatever share a co-tenant is taking.
    * This is the contention signal the SERIAL probe cannot see — a
    * co-tenant stealing 10 of 32 cores leaves a one-thread probe
    * untouched while inflating every 32-thread Spark stage — and it is
    * what the per-run gate now keys on. */
  def spinProbeParSec(): Double = {
    val threads = Runtime.getRuntime.availableProcessors
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { k =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L ^ k.toLong
        var i = 0L
        while (i < spinIters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        if (x == 0L) System.err.println("unreachable")
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def load(): Double = os.getSystemLoadAverage
    // process-CPU share (this JVM's recent CPU use, 0..1): with the system
    // loadavg it separates "query was slow" from "machine was busy" —
    // com.sun.management is the JDK's own extension interface, present on
    // every HotSpot
    def procCpu(): Double = os match {
      case x: com.sun.management.OperatingSystemMXBean => x.getProcessCpuLoad
      case _ => -1.0
    }
    // recent system-wide CPU share (0..1): unlike the 1-min loadavg it
    // reacts in seconds, so it can gate BETWEEN runs — after a measured
    // run, the loadavg needs minutes to decay even on an idle machine
    // (r9's 13.6% warm spread was co-tenant load that the start-only gate
    // never re-checked), while getCpuLoad distinguishes "indicator still
    // decaying" from "co-tenant actively burning cores"
    def sysCpu(): Double = os match {
      case x: com.sun.management.OperatingSystemMXBean => x.getCpuLoad
      case _ => -1.0
    }

    // idle gate: an external co-tenant (NOT this JVM — Spark isn't running
    // yet) pushing the 1-min load above the threshold perturbs every
    // measurement; wait it out, bounded so the driver never hangs
    val gate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "2.0").toDouble
    val gateWaitMax = sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SEC", "180").toLong
    val loadAtStart = load()
    var gateWaited = 0L
    while (load() > gate && gateWaited < gateWaitMax) {
      Thread.sleep(5000); gateWaited += 5
    }
    val loadAfterGate = load()

    // JIT-warm the spin loop (first call pays compilation), then take the
    // session-start calibration readings — serial (per-core speed) and
    // parallel (delivered-core count)
    spinProbeSec()
    var bestSpin = spinProbeSec()
    val spinAtStart = bestSpin
    var bestSpinPar = spinProbeParSec()
    val spinParAtStart = bestSpinPar

    // engine defaults measured by the knee probe (Sessions: zstd codec,
    // 2×-cores shuffle partitions), env-overridable for A/B
    val spark = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped as TIMESTAMP(NANOS) and as timestamp[us];
      // nanosAsLong covers the ns variant, EventOps.tsMicros adapts to both
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the alphabetically-first
    // query doesn't absorb session startup in its measurement
    spark.range(1000000).selectExpr("bit_xor(xxhash64(id))").collect()
    // warm-up failure must not kill the bench before a single measurement —
    // the measured pass records the real error per-query
    try SparkEntry.queries.get("q13_topk").foreach(fn => fn(spark, sfDir).collect())
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up query failed (continuing): ${e.getMessage}")
    }

    // local-iteration filter (comma-separated name prefixes); the driver
    // sets only SPARK_GRAFT_SF_DIR, so official artifacts always cover
    // every query
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    def selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }

    // per query: (name, seconds, loadavg at query end, process-CPU share) —
    // the per-query environment record that lets a single noisy query in an
    // otherwise-clean run be adjudicated from the artifact alone.
    // A query that THROWS is recorded in `errors` (name + message) and
    // skipped for the rest of the bench; the run still measures the other
    // 90+ queries and the process exits nonzero at the end. Round 8 lost
    // the whole artifact — 92 queries' numbers AND the failing query's
    // name — to one AnalysisException thrown mid-run.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def measure(): Seq[(String, Double, Double, Double)] =
      selected.flatMap { case (name, fn) =>
        if (errors.contains(name)) None
        else {
          procCpu() // reset the process-CPU window so the share covers THIS
          // query's span, not the previous query's cleanup/GC or idle gap
          val t0 = System.nanoTime()
          val res = try {
            val df = fn(spark, sfDir)
            df.select(bit_xor(xxhash64(df.columns.toIndexedSeq.map(col): _*))).collect()
            val elapsed = (System.nanoTime() - t0) / 1e9
            val (l, pc) = (load(), procCpu())
            Some((name, elapsed, l, pc))
          } catch { case e: Throwable =>
            errors(name) =
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
            System.err.println(s"[bench] $name FAILED: ${errors(name)}")
            None
          }
          interQueryCleanup(spark)
          res
        }
      }

    // per-run idle gate: before each measured pass, wait (bounded) until
    // the recent system CPU share stays below the gate for two consecutive
    // samples — catches a co-tenant that spun up AFTER the session-start
    // loadavg gate passed. Skipped when the JMX bean can't report it.
    val runGate = sys.env.getOrElse("SPARK_GRAFT_RUN_CPU_GATE", "0.20").toDouble
    val runGateWaitMax = sys.env.getOrElse("SPARK_GRAFT_RUN_CPU_WAIT_SEC", "60").toLong
    def runGateWait(): Long = {
      var waited = 0L
      var ok = 0
      while (ok < 2 && waited < runGateWaitMax && sysCpu() >= 0) {
        Thread.sleep(2000); waited += 2
        if (sysCpu() < runGate) ok += 1 else ok = 0
      }
      waited
    }

    // spin gate: before each run, require the calibration probe within
    // `spinTol` of the best probe this session — the one signal that sees
    // host co-tenancy. Bounded wait; a still-contended run proceeds but
    // its pre/post probes land in the artifact, so it self-identifies.
    val spinTol = sys.env.getOrElse("SPARK_GRAFT_SPIN_TOL", "1.10").toDouble
    val spinWaitMax = sys.env.getOrElse("SPARK_GRAFT_SPIN_WAIT_SEC", "90").toLong
    // the gate keys on the PARALLEL probe (delivered cores — what every
    // 32-thread stage actually gets); the serial probe is recorded as
    // the per-core-speed baseline
    def spinGateWait(): (Double, Long) = {
      var waited = 0L
      var p = spinProbeParSec()
      bestSpinPar = math.min(bestSpinPar, p)
      while (p > bestSpinPar * spinTol && waited < spinWaitMax) {
        Thread.sleep(5000); waited += 5
        p = spinProbeParSec()
        bestSpinPar = math.min(bestSpinPar, p)
      }
      (p, waited)
    }

    val reps = math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val runs = (1 to reps).map { _ =>
      val gw = runGateWait()
      val (spinPre, spinWaited) = spinGateWait()
      val l0 = load()
      val r = measure()
      val spinPost = spinProbeParSec()
      bestSpinPar = math.min(bestSpinPar, spinPost)
      (r, l0, load(), gw, spinPre, spinPost, spinWaited)
    }
    val byName = runs.map(_._1.map(r => r._1 -> r).toMap)
    // a query can fail in a later run only (flaky): take the min over the
    // runs that DID measure it, and let `errors` carry the failure
    val measuredNames = runs.flatMap(_._1.map(_._1)).distinct
    val results = measuredNames.map { name =>
      name -> byName.flatMap(_.get(name).map(_._2)).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // headline value = the BEST SINGLE RUN's total — a total some run
    // actually achieved, comparable across rounds. The per-query numbers
    // are per-query minima across runs (labeled as such); their sum is a
    // composite no single run achieved, so it's reported separately.
    // totals are comparable only over queries measured in EVERY run — a
    // query that succeeds in run 1 but fails in run 2 would otherwise
    // deflate run 2's sum and bias the min() headline toward the
    // deficient run. With zero errors (the normal case) this is all
    // queries; n_total_queries in the artifact records the basis.
    val commonNames: Set[String] =
      if (runs.isEmpty) Set.empty
      else runs.map(_._1.map(_._1).toSet).reduce(_ intersect _)
    val totals = runs.map(_._1.filter(r => commonNames(r._1)).map(_._2).sum)
    val total = totals.min
    // guard the min==0 edge (every query failed): 0/0 = NaN is not valid
    // JSON and would make the partial artifact unparseable in exactly the
    // catastrophic case it exists to describe
    def rel(ts: Seq[Double]): Double =
      if (ts.nonEmpty && ts.min > 0) (ts.max - ts.min) / ts.min else 0.0
    val spread = rel(totals)
    // run 1 pays per-query codegen JIT no warm-up loop fully removes; the
    // stability signal is the spread of the WARM runs
    val warmTotals = if (totals.length >= 3) totals.drop(1) else totals
    val warmSpread = rel(warmTotals)
    val minComposite = results.map(_._2).sum
    // Locale.ROOT: f"%.2f" under a comma-decimal default locale would
    // corrupt the machine-parsed JSON ("3,14" reads as two array cells)
    def f2(x: Double): String = String.format(java.util.Locale.ROOT, "%.2f", x: java.lang.Double)
    val runLoads = runs.map { case (_, l0, l1, _, _, _, _) => s"[${f2(l0)},${f2(l1)}]" }
    val runGateWaits = runs.map(_._4)
    // pre/post PARALLEL spin probes per run: a run whose probes sit well
    // above spin_par_best was measured under host contention — discount it
    val runSpins = runs.map { case (_, _, _, _, p0, p1, _) => s"[${f2(p0)},${f2(p1)}]" }
    val spinGateWaits = runs.map(_._7)
    // per-query per-run [loadavg, processCpuShare] pairs, in run order
    // (runs where the query failed are absent)
    val queryLoads = measuredNames.map { name =>
      val cells = byName.flatMap(_.get(name)).map {
        case (_, _, l, pc) => s"[${f2(l)},${f2(pc)}]"
      }
      "\"" + name + "\":[" + cells.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val env = s"""{"cpus":${Runtime.getRuntime.availableProcessors},""" +
      s""""shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")},""" +
      s""""io_codec":"${spark.conf.get("spark.io.compression.codec")}",""" +
      s""""load_avg":${load()},"load_at_start":$loadAtStart,""" +
      s""""load_gate":$gate,"gate_waited_sec":$gateWaited,""" +
      s""""load_after_gate":$loadAfterGate,""" +
      s""""run_loads":[${runLoads.mkString(",")}],""" +
      s""""query_loads":$queryLoads,""" +
      s""""run_gate_waits_sec":[${runGateWaits.mkString(",")}],""" +
      s""""run_cpu_gate":$runGate,""" +
      s""""spin_iters":$spinIters,"spin_at_start":${f2(spinAtStart)},""" +
      s""""spin_best":${f2(bestSpin)},"spin_tol":$spinTol,""" +
      s""""spin_par_at_start":${f2(spinParAtStart)},""" +
      s""""spin_par_best":${f2(bestSpinPar)},""" +
      s""""run_spin_par_probes":[${runSpins.mkString(",")}],""" +
      s""""spin_gate_waits_sec":[${spinGateWaits.mkString(",")}],""" +
      s""""n_total_queries":${commonNames.size},""" +
      s""""run_total_spread":$spread,"warm_run_spread":$warmSpread,""" +
      s""""heap_max_gb":${Runtime.getRuntime.maxMemory / (1L << 30)},""" +
      s""""run_totals":[${totals.mkString(",")}]}"""
    // JSON string escape for error messages (same contract as Verify)
    def jq(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }
      .mkString("{", ",", "}")
    // CERTIFICATION (r14, verdict #4): an artifact is certified iff the
    // warm-run spread is inside the repo's ≤8% bar AND the defining
    // (best) run's boundary parallel probes sit within the spin
    // tolerance of the session best — i.e. the headline number was
    // measured on a quiet host. An uncertified artifact still carries
    // every number, but says so, so round notes can never cite a
    // contended run as official.
    val bestRunIdx = if (totals.nonEmpty) totals.indexOf(total) else -1
    val bestRunProbesOk = bestRunIdx >= 0 && {
      val (_, _, _, _, p0, p1, _) = runs(bestRunIdx)
      math.max(p0, p1) <= bestSpinPar * spinTol
    }
    val certified = errors.isEmpty && warmSpread <= 0.08 && bestRunProbesOk
    val certifyReason =
      if (certified) "warm_spread<=8% and best-run probes within spin_tol"
      else Seq(
        if (errors.nonEmpty) Some("query errors") else None,
        if (warmSpread > 0.08) Some(f"warm_spread ${warmSpread * 100}%.1f%% > 8%%")
        else None,
        if (!bestRunProbesOk) Some("best-run probes above spin_tol") else None
      ).flatten.mkString("; ")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""per_query_stat":"min_of_${runs.length}","total_min_composite":$minComposite,""" +
      s""""sf":"$sfDir","runs":${runs.length},"n_errors":${errors.size},""" +
      s""""certified":$certified,"certify_reason":${jq(certifyReason)},""" +
      s""""errors":$errJson,"env":$env}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
    // fail-fast contract preserved: a broken query must fail the bench —
    // but only after the partial table (with the failing names) is on disk
    if (errors.nonEmpty) sys.exit(1)
  }
}

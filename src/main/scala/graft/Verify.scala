package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Runs each gate, writing results under `outDir/<name>`; a gate that
    * THROWS is recorded in the returned (name → error) map, in
    * `outDir/errors.json`, and as a per-gate `<name>._ERROR` marker file.
    * Round 8: six broken gates silently vanished from CORRECTNESS because
    * the old catch only printed to stderr — the artifact must never shrink
    * without a trace. Factored out of main so the failure path is
    * spec-gated (`VerifyErrorSpec`). */
  def runGates(spark: SparkSession, sfDir: String, outDir: String,
               gates: Seq[(String, (SparkSession, String) => DataFrame)])
      : Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    gates.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        Files.writeString(Paths.get(s"$outDir/${name}._ERROR"), msg)
      }
      // the parquet write fully materialized the result — release the
      // gate's internal checkpoints NOW (the Bench discipline) so block
      // storage doesn't accumulate across a 200+-gate board
      finally graft.operators.Checkpoints.releaseAll()
    }
    val errJson = errors.map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} gate(s) FAILED: " +
        errors.keys.mkString(", "))
    errors.toMap
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // engine defaults measured by the knee probe (Sessions: zstd codec,
    // 2×-cores shuffle partitions) — checksum-neutral by the probe's
    // evidence, so the correctness gate runs on the same knobs as Bench
    val spark = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts has shipped as TIMESTAMP(NANOS) and as timestamp[us];
      // nanosAsLong covers the ns variant, EventOps.tsMicros adapts to both
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration filter (comma-separated names); driver sets nothing
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val errors = runGates(spark, sfDir, outDir,
      SparkEntry.queries.toSeq
        .filter { case (name, _) => only.forall(_.contains(name)) })
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // same fail-fast contract as Bench: a driver gating on exit code alone
    // must not see a run with failed gates as green. All artifacts
    // (per-gate parquet, _ERROR markers, errors.json, oracle_sql.json)
    // are already on disk by this point.
    if (errors.nonEmpty) sys.exit(1)
  }
}

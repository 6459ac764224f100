package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines corpus ingestion — the de-facto wire format of text
  * pipelines (one document object per line).
  *
  * Scale rules this wrapper enforces rather than documents:
  *  - an EXPLICIT schema is mandatory: `spark.read.json` without one runs
  *    a full inference pass first — at 100 TB that reads the corpus twice
  *    and silently widens types from whatever happens to be in the data;
  *  - malformed lines are captured, not dropped: PERMISSIVE mode with a
  *    `_corrupt_record` column, so a bad shard surfaces as quarantined
  *    rows (query them with [[corruptRecords]]) instead of a silent
  *    row-count dip. `FAILFAST` is one flag away when the contract is
  *    "any bad line kills the job".
  */
object Jsonl {

  val corruptCol = "_graft_corrupt"

  /** Reads JSONL with the given schema; malformed lines land in
    * [[corruptCol]] with every data column null. */
  def read(spark: SparkSession, path: String, schema: StructType,
           failFast: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not declare the internal column $corruptCol")
    val full = schema.add(corruptCol, "string")
    spark.read
      .schema(full)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** The well-formed rows, corrupt column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(corruptCol).isNull).drop(corruptCol)

  /** The quarantined raw lines (for triage / dead-letter sinks).
    *
    * Caches the parsed scan first: Spark refuses a query whose only
    * referenced column is the corrupt-record column of a raw JSON scan
    * (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`) — caching
    * is the documented workaround, and it is also what a pipeline wants
    * when it splits ONE parse into a clean stream and a quarantine
    * stream (the [[clean]] call reuses the same cache). The cache is a
    * SIDE EFFECT on the passed DataFrame and pins the parsed corpus for
    * the session — call [[release]] once both streams are consumed. */
  def corruptRecords(df: DataFrame): DataFrame =
    df.cache().filter(col(corruptCol).isNotNull).select(col(corruptCol).as("raw_line"))

  /** Releases the cache [[corruptRecords]] planted on the parsed scan.
    * Safe to call on an uncached frame (no-op). */
  def release(df: DataFrame): Unit = df.unpersist(false)
}

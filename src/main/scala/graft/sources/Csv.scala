package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV corpus ingestion with the same contract as [[Jsonl]] — the other
  * wire format corpora actually arrive in (metadata dumps, label sheets,
  * crawl manifests).
  *
  * Scale rules enforced rather than documented:
  *  - an EXPLICIT schema is mandatory: `inferSchema` runs a full extra
  *    pass over the data (twice the 100 TB scan) and silently widens
  *    types from whatever the sample happened to hold;
  *  - malformed lines are captured, not dropped: PERMISSIVE mode with a
  *    corrupt-record column, so a truncated shard or a stray quote
  *    surfaces as quarantined raw lines ([[Jsonl.corruptRecords]] works
  *    on this frame — same column contract) instead of a silent
  *    row-count dip; `failFast` flips to FAILFAST when the contract is
  *    "any bad line kills the job";
  *  - `multiLine` stays OFF: a multi-line CSV file is ONE splittable
  *    unit per file (no intra-file parallelism) and is the single most
  *    common accidental way to serialize a 100 TB scan behind one task.
  *    Quoted embedded newlines need it — opt in per call and keep such
  *    files small.
  */
object Csv {

  /** Reads CSV with the given schema; malformed lines land in
    * [[Jsonl.corruptCol]] with every data column null. */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, delimiter: String = ",",
           failFast: Boolean = false, multiLine: Boolean = false): DataFrame = {
    require(!schema.fieldNames.contains(Jsonl.corruptCol),
      s"schema must not declare the internal column ${Jsonl.corruptCol}")
    val full = schema.add(Jsonl.corruptCol, "string")
    spark.read
      .schema(full)
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Jsonl.corruptCol)
      .option("multiLine", multiLine)
      .csv(path)
  }

  /** The well-formed rows, corrupt column dropped (same as
    * [[Jsonl.clean]] — shared column contract). */
  def clean(df: DataFrame): DataFrame = Jsonl.clean(df)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Row-text interchange — CSV and JSON-lines, the formats data actually
  * ARRIVES in (exports, logs, API dumps) before anything columnar
  * exists. Both are scan-expensive at 100 TB (no column pruning, no
  * predicate pushdown, full-row parsing), so the library's position is:
  * ingest once, validate loudly, convert to parquet — these wrappers pin
  * the ingest conventions.
  *
  * Conventions enforced rather than documented:
  *  - reads take an EXPLICIT schema — schema inference is a full extra
  *    pass over the data at scale AND nondeterministic under sampling;
  *  - CSV reads run FAILFAST: a malformed row raises instead of becoming
  *    a silent NULL row (PERMISSIVE's default), because silently dropped
  *    cells in a 100 TB ingest surface weeks later as impossible joins;
  *  - `numFiles > 0` repartitions before the write (the [[Orc]]
  *    anti-tiny-file rule); gzip is pinned for the text formats — the
  *    splittability loss is irrelevant for hand-over files and the 5–10×
  *    size win dominates transfer cost.
  */
object Text {

  def saveCsv(df: DataFrame, path: String, numFiles: Int = 0): DataFrame = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("compression", "gzip").csv(path)
    df
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST").csv(path)

  def saveJsonl(df: DataFrame, path: String, numFiles: Int = 0): DataFrame = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
    df
  }

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}

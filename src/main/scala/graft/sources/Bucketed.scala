package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed managed-table layout — the CO-LOCATED JOIN primitive:
  * two tables bucketed on the same key with the same bucket count join
  * bucket-to-bucket, so the planner drops BOTH shuffle exchanges (each
  * side's files are already hash-partitioned on disk). At 100 TB this
  * converts every fact-to-fact join on the bucket key from the cluster's
  * largest exchange into a zero-shuffle zip of pre-hashed files — the
  * write-once-join-often trade every warehouse makes for its hot join
  * keys. Bucketing composes with the bucket count as parallelism floor:
  * pick nBuckets ≈ the target cluster's cores, not the laptop's.
  *
  * `sorted` additionally sorts within buckets on the key, letting the
  * sort-merge join skip its sort when each bucket holds one file.
  * (Spark's bucketed scan is exchange-free regardless; the sort saving
  * is best-effort by file count — documented, not promised.)
  */
object Bucketed {

  def saveBucketed(df: DataFrame, table: String, key: String, nBuckets: Int,
                   sorted: Boolean = true): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(df.columns.contains(key), s"no such column: $key")
    require(table.matches("[A-Za-z0-9_]+"), s"unsafe table name: $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory metastore forgets tables between JVMs but the managed
    // LOCATION persists on disk; CREATE then refuses with
    // LOCATION_ALREADY_EXISTS — clear the orphaned dir (scoped strictly
    // to <warehouse>/<table>)
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = new java.io.File(wh, table.toLowerCase)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    if (loc.exists()) rm(loc)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

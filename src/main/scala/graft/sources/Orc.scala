package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC interchange — the columnar format warehouse estates that predate
  * Parquet standardization still hand over (Hive-era extracts). Spark's
  * native ORC reader/writer gives the same columnar virtues as Parquet
  * (column pruning, predicate pushdown into stripe/row-group indexes,
  * splittable files), so ingesting ORC costs nothing over Parquet at
  * 100 TB; this wrapper exists to pin the library's I/O conventions on
  * the format.
  *
  * Scale rules enforced rather than documented:
  *  - compression is pinned (zstd) rather than left to cluster-default
  *    drift — mixed-codec datasets make file sizes, and therefore split
  *    planning, unpredictable across refreshes;
  *  - `numFiles > 0` repartitions BEFORE the write: the writer emits one
  *    file per task, and letting an upstream shuffle's task count dictate
  *    file granularity is how 10k-tiny-file datasets happen.
  */
object Orc {

  def save(df: DataFrame, path: String, numFiles: Int = 0): DataFrame = {
    val out = if (numFiles > 0) df.repartition(numFiles) else df
    out.write.mode(SaveMode.Overwrite).option("compression", "zstd").orc(path)
    df
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
}

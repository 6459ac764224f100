package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-partitioned parquet layout — the directory-per-value scheme
  * (`path/col=value/…`) that turns a filter on the partition column into
  * NOT READING the other directories at all: partition pruning happens
  * at planning time, before a single byte of data is opened. At 100 TB
  * this is the difference between scanning one day and scanning three
  * years — the first layout decision any fact table gets, ahead of
  * z-ordering (which orders WITHIN files what partitioning separates
  * BETWEEN directories).
  *
  * Write convention enforced: the frame is repartitioned BY the
  * partition column first, so each partition's rows land in the tasks
  * that write that directory — without it, every task holding a few
  * rows of every value writes a file into EVERY directory
  * (tasks × values tiny files, the classic partitioned-write accident).
  * Keep the column low-cardinality (status codes, dates), never an id.
  */
object Partitioned {

  def save(df: DataFrame, path: String, partitionCol: String): DataFrame = {
    df.repartition(col(partitionCol))
      .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    df
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The range-shuffle input-cache knob shared by every range-partitioned
  * operator ([[GlobalRank]], [[OrderStats]], [[PrefixSum]],
  * [[SlidingAggregate.scalable]]).
  *
  * Those operators scan their input TWICE: once for the RangePartitioner's
  * bounds sample and once for the shuffle map stage. Caching the input
  * trades executor storage for the second scan — and the right trade
  * depends on the regime:
  *
  *  - Input ≪ executor storage (local runs, the bench): MEMORY_AND_DISK
  *    wins — the second scan would re-decode the whole parquet source.
  *  - Input ≳ executor storage (the 100 TB design point): materializing
  *    the dataset as row-converted cache blocks is itself a capacity risk,
  *    and writing the cache can cost more than a second columnar scan with
  *    pushdown (Spark's own `orderBy` caches nothing). Set the knob to
  *    `NONE` and let the source serve both scans, or `DISK_ONLY` to keep
  *    the single-scan property without competing for executor memory.
  *
  * Knob: `spark.graft.rangeInput.storageLevel` — any
  * `StorageLevel.fromString` name (`MEMORY_AND_DISK` default, `DISK_ONLY`,
  * `MEMORY_ONLY`, ...) or `NONE` to disable caching entirely.
  *
  * [[acquire]] also refuses to touch a frame the CALLER already cached:
  * Spark's CacheManager keys entries by analyzed plan, so a second persist
  * of a logically identical frame no-ops and the paired unpersist would
  * silently drop the caller's cache. Already-cached inputs are used as-is
  * and the release thunk does nothing.
  */
private[graft] object RangeInputCache {
  val ConfKey = "spark.graft.rangeInput.storageLevel"

  private def level(spark: SparkSession): Option[StorageLevel] = {
    val name = spark.conf.get(ConfKey, "MEMORY_AND_DISK").trim
    if (name.equalsIgnoreCase("NONE")) None
    else Some(StorageLevel.fromString(name.toUpperCase))
  }

  /** Persist `df` per the knob. Returns the frame to read (cached or not)
    * and a release thunk for when downstream holds the data (shuffle files
    * written). */
  def acquire(df: DataFrame): (DataFrame, () => Unit) =
    if (df.storageLevel != StorageLevel.NONE) (df, () => ()) // caller's cache
    else level(df.sparkSession) match {
      case Some(lvl) => (df.persist(lvl), () => { df.unpersist(blocking = false); () })
      case None      => (df, () => ())
    }

  /** RDD-layer twin of [[acquire]]. */
  def acquireRdd[T](rdd: RDD[T], spark: SparkSession): (RDD[T], () => Unit) =
    if (rdd.getStorageLevel != StorageLevel.NONE) (rdd, () => ())
    else level(spark) match {
      case Some(lvl) => (rdd.persist(lvl), () => { rdd.unpersist(blocking = false); () })
      case None      => (rdd, () => ())
    }
}

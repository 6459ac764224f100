package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-table relational utilities that aren't tied to one domain. */
object TableOps {

  /** Snapshot diff — the daily-pipeline "what changed between yesterday's
    * and today's extract" primitive: keys only in `newDf` → `added`, keys
    * only in `oldDf` → `removed`, keys in both whose non-key columns
    * differ → `changed`; unchanged rows are dropped. Output:
    * (<key>, status), ordered by key.
    *
    * The comparison is EXACT struct equality (null-safe `<=>`) over the
    * non-key columns in sorted-name order — no hashing, so no collision
    * caveat and a DuckDB oracle can replicate it cell-for-cell. At 100 TB
    * the shape is one full-outer sort-merge join co-partitioned on the
    * key; a production variant can pre-hash each side's struct down to
    * 8 bytes before the exchange (same join, 1/row-width the shuffle
    * volume) at the cost of a 2^-64 collision. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    require(oldDf.columns.contains(key), s"key $key missing")
    val cols = oldDf.columns.filterNot(_ == key).sorted.toIndexedSeq
    def pack(df: DataFrame, side: String) =
      df.select(col(key), struct(cols.map(col): _*).as(side))
    pack(oldDf, "o").join(pack(newDf, "n"), Seq(key), "full_outer")
      .select(col(key),
        when(col("o").isNull, lit("added"))
          .when(col("n").isNull, lit("removed"))
          .when(!(col("o") <=> col("n")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(key)
  }
}

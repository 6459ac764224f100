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
  /** Mode (most frequent value) of `value` per `key`, deterministic
    * tie-break on the smaller value. Output: (<key>, mode_value, n).
    *
    * Window-free: count per (key, value), then a second map-side-combined
    * aggregation argmins the composite (-n, value) struct — struct
    * ordering is field-lexicographic, so the minimum is exactly "highest
    * count, then smallest value". Two exchanges on small count tables,
    * no per-key sort, no rank window — the shape that survives a key
    * whose value cardinality is huge. */
  def modePerGroup(df: DataFrame, key: String, value: String): DataFrame = {
    val counts = df.groupBy(col(key), col(value)).agg(count(lit(1)).as("n"))
    counts.groupBy(col(key))
      .agg(min_by(struct(col(value).as("mode_value"), col("n")),
        struct((-col("n")).as("neg_n"), col(value).as("v"))).as("m"))
      .select(col(key), col("m.mode_value").as("mode_value"), col("m.n").as("n"))
      .orderBy(key)
  }

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

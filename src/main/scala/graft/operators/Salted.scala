package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's skew
  * split can't help (e.g. a shuffle hash join where ONE key holds a double-
  * digit percentage of all rows, so even split sub-partitions hotspot).
  *
  * `join` replicates the (small-ish) right side `factor` times, one copy
  * per salt value, and spreads the left side's hot keys across the salted
  * composite key deterministically (hash of a distinguishing left column,
  * NOT a random — reruns must produce identical partitioning for
  * reproducible plans and tests). The join key becomes (key, salt), so a
  * key that held p% of rows now holds p/factor% per shuffle partition.
  * Cost: right side × factor; apply to the skewed keys only when the
  * right side is large. */
object Salted {

  def join(left: DataFrame, right: DataFrame, key: String,
           saltCol: String, factor: Int): DataFrame = {
    // factor = 0 would yield pmod NULL on the left and salts {0, -1} on
    // the right — a silently EMPTY join result, not an error
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    Seq(left -> "left", right -> "right").foreach { case (df, side) =>
      require(!df.columns.contains("_salt"), // would be overwritten + dropped
        s"$side input already has a '_salt' column")
    }
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(saltCol)), lit(factor.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}

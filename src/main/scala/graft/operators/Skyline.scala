package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 2-D Pareto frontier (skyline): the rows no other row STRICTLY
  * dominates — x' > x AND y' > y — the multi-criteria "best trade-offs"
  * filter (quality-vs-length corpus curation, cost-vs-accuracy model
  * sweeps, spend-vs-frequency account tiers).
  *
  * The staircase observation replaces the naive all-pairs dominance
  * anti-join (O(n²), the only pure-SQL form) with ONE monotone scan: a
  * point is dominated iff max{ y' : x' > x } > y. So: frequency-compress
  * to (x, max y) — exchange O(distinct x) — then an exclusive prefix-MAX
  * over distinct x DESCENDING ([[PrefixSum.scan]] with
  * [[LongMonoid.Max]], the TeraSort two-pass machinery — O(parts) driver
  * state, never a partitionless window), and join the O(distinct x)
  * threshold table back co-partitioned to keep every surviving point.
  * Ties survive in both axes (equal is not strict dominance).
  */
object Skyline {

  /** Rows of `df` (NULL x/y rows dropped — dominance over NULL is
    * undefined) not strictly dominated on BIGINT columns (x, y). */
  def pareto2d(df: DataFrame, x: String, y: String): DataFrame = {
    require(x != y, s"skyline needs two distinct criteria, got '$x' twice")
    Seq(x, y).foreach { c =>
      require(df.columns.contains(c), s"no such column: $c")
      require(!c.startsWith("__"), s"column name '$c' collides with internal __* names")
      require(df.schema(c).dataType == LongType, s"$c must be BIGINT")
    }
    val pts = df.filter(col(x).isNotNull && col(y).isNotNull)
    val perX = pts.groupBy(col(x)).agg(max(col(y)).as("__ymax"))
    // __dom = max y over STRICTLY greater x (exclusive prefix, x desc);
    // the monoid zero (Long.MinValue) at the staircase top dominates
    // nothing, so `y >= __dom` keeps it unconditionally
    val thr = PrefixSum.scan(perX, "__ymax", "__dom", numParts = 0,
        LongMonoid.Max, col(x).desc)
      .select(col(x), col("__dom"))
    pts.join(thr, Seq(x))
      .filter(col(y) >= col("__dom"))
      .drop("__dom")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}

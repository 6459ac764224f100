package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-ORDER (Morton) data layout — the multi-column pruning lever every
  * 100 TB table eventually needs: a scan filtered on TWO OR MORE
  * columns can only skip files/row-groups whose min/max footer stats
  * exclude the predicate, and a table sorted on one column interleaves
  * the others arbitrarily, so their stats span everything and prune
  * nothing. Sorting by the Z-VALUE — the bit-interleave of the
  * columns — makes every contiguous slice of rows an (approximately)
  * axis-aligned box in value space: each written file covers a small
  * rectangle, its per-column min/max are TIGHT, and a box predicate on
  * ANY dimension subset skips most files (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` idea, re-expressed with open Spark APIs:
  * `repartitionByRange(zval) + sortWithinPartitions(zval)`).
  *
  * The z-value arithmetic is plain integer shifts and masks — fully
  * deterministic and replayable in any SQL engine ([[zValueSql]]
  * generates the equivalent `((x >> b) & 1) * 2^k` sum for the oracle),
  * which is what the q226 gate pins. Inputs must already be
  * non-negative integers in [0, 2^bits) — RAISE on out-of-domain
  * rather than silently wrapping (the Association lift-fraction
  * discipline): a wrapped coordinate lands the row in a far-away file
  * and quietly destroys the very pruning the layout promises.
  * Normalize first (subtract min, quantize timestamps to days, rank
  * skewed ids) — normalization choices are the caller's semantics, not
  * this operator's.
  */
object Layout {

  private def checkDims(nDims: Int, bits: Int): Unit = {
    require(nDims >= 2 && nDims <= 6, s"zValue needs 2..6 columns, got $nDims")
    require(bits >= 1 && bits * nDims <= 62,
      s"bits·dims must fit a non-negative Int64: $bits × $nDims > 62")
  }

  /** The Morton z-value of `cols` (BIGINT, each in [0, 2^bits)):
    * bit b of column i lands at interleaved position b·d + i. Columns
    * are validated eagerly — NULL or out-of-domain RAISES. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    checkDims(cols.size, bits)
    val lim = 1L << bits
    val d = cols.size
    val checked = cols.zipWithIndex.map { case (c, i) =>
      when(c.isNull || c < 0L || c >= lim, raise_error(format_string(
          s"zValue: column $i must be a non-NULL integer in [0, $lim) " +
            s"(bits=$bits), got %s — normalize before layout",
          coalesce(c.cast("string"), lit("NULL")))))
        .otherwise(c.cast(LongType))
    }
    (for {
      (c, i) <- checked.zipWithIndex
      b <- 0 until bits
    } yield (shiftright(c, b).bitwiseAND(lit(1L))) * lit(1L << (b * d + i)))
      .reduce(_ + _)
  }

  /** Decodes coordinate `dim` back out of a z-value — the inverse of
    * [[zValue]] on the declared domain (spec-pinned bijection). */
  def unzValue(z: Column, dim: Int, nDims: Int, bits: Int): Column = {
    checkDims(nDims, bits)
    require(dim >= 0 && dim < nDims, s"dim must be in [0, $nDims), got $dim")
    (0 until bits)
      .map(b => (shiftright(z, b * nDims + dim).bitwiseAND(lit(1L))) *
        lit(1L << b))
      .reduce(_ + _)
  }

  /** The SQL form of [[zValue]] for a foreign-engine replay (the q226
    * oracle): the identical shift/mask sum in portable SQL over the
    * given column expressions. Domain validation is the Spark side's
    * job; the replay assumes in-domain inputs. */
  def zValueSql(cols: Seq[String], bits: Int): String = {
    checkDims(cols.size, bits)
    val d = cols.size
    (for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield s"(($c >> $b) & 1) * ${1L << (b * d + i)}")
      .mkString("(", " + ", ")")
  }

  /** Z-order-clusters `df` for writing: appends the z-value of
    * `zCols` (each already normalized to [0, 2^bits)), range-partitions
    * on it into `numFiles` contiguous z-slices, and sorts within each —
    * every output file then covers one tight rectangle of the value
    * space. Write the result with a plain `.write.parquet`; the z
    * column is dropped (it was layout, not data). The range boundaries
    * come from Spark's range-partitioner sample — LAYOUT, not
    * semantics, so sampling nondeterminism is harmless (the row SET is
    * unchanged; q226 gates the z-value arithmetic instead). */
  def cluster(df: DataFrame, zCols: Seq[String], bits: Int,
              numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    zCols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    require(!df.columns.contains("__z"),
      "column name '__z' collides with the layout column")
    df.withColumn("__z", zValue(zCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}

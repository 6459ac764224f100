package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward (inclusive) as-of join — for each left row, the most recent
  * right row with the same partition key and time <= the left row's time.
  *
  * Spark has no built-in as-of join; the scalable formulation is the
  * union-merge trick: tag both sides, union, and take
  * `last(payload, ignoreNulls)` over a per-key window ordered by
  * (time, tag, tiebreak) with right rows sorting BEFORE left rows at equal
  * times (inclusive semantics). ONE shuffle on the partition key, no
  * per-key loops, no range-cross-join — the same plan shape Flink/Pandas
  * merge_asof use. Skewed keys fall to AQE / salting like any keyed window.
  */
object AsOf {

  /** @param partitionCols equality keys
    * @param timeCol       ordering column (same name on both sides)
    * @param leftTie       unique left column breaking time ties deterministically
    * @param rightTie      unique right column breaking time ties deterministically
    * @param payloadCols   right-side columns to surface, as a struct `asof`
    */
  def backward(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               timeCol: String, leftTie: String, rightTie: String,
               payloadCols: Seq[String]): DataFrame = {
    // the internal tag/tie/payload columns and the output column would
    // silently overwrite (then drop) same-named caller columns — e.g. the
    // 'asof' of a previous backward() pass being re-joined
    Seq("asof", "_tag", "_tie", "_payload").foreach { c =>
      require(!left.columns.contains(c),
        s"left input already has a '$c' column (reserved by AsOf.backward)")
    }
    // same guard on the right: a '_tie'/'_tag'/'_payload' among its
    // partition/time/payload columns would shadow the internals or make
    // the select ambiguous
    Seq("_tag", "_tie", "_payload").foreach { c =>
      require(!right.columns.contains(c),
        s"right input already has a '$c' column (reserved by AsOf.backward)")
    }
    val r2 = right.select((partitionCols :+ timeCol).map(col) :+
      col(rightTie).as("_tie") :+
      struct(payloadCols.map(col): _*).as("_payload"): _*)
      .withColumn("_tag", lit(0))
    val payType = r2.schema("_payload").dataType
    val l2 = left
      .withColumn("_tie", col(leftTie))
      .withColumn("_payload", lit(null).cast(payType))
      .withColumn("_tag", lit(1))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(timeCol), col("_tag"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_tie", "_payload")
  }

  /** Forward (inclusive) as-of join with an optional tolerance — for
    * each left row, the EARLIEST right row with the same key and time ≥
    * the left row's time (pandas merge_asof direction='forward'); with
    * `toleranceUs`, only if it lands within leftTime + tolerance, else
    * `asof` is NULL. The null rows ARE the window anti-join: "views with
    * no purchase inside the hour" falls out as `asof IS NULL` — no
    * second pass. Same union-merge shape as [[backward]] (one shuffle on
    * the key, no range-cross-join): left rows sort BEFORE right rows at
    * equal times (inclusive ≥), and the match is
    * `first(payload, ignoreNulls)` over the FORWARD window. The matched
    * right time rides the payload struct as field `_t` — both the
    * tolerance check and the caller's latency math read it. */
  def forward(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
              timeCol: String, leftTie: String, rightTie: String,
              payloadCols: Seq[String],
              toleranceUs: Option[Long] = None): DataFrame = {
    toleranceUs.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    require(!payloadCols.contains("_t"),
      "payload column name '_t' is reserved for the matched right time")
    Seq("asof", "_tag", "_tie", "_payload").foreach { c =>
      require(!left.columns.contains(c),
        s"left input already has a '$c' column (reserved by AsOf.forward)")
    }
    Seq("_tag", "_tie", "_payload").foreach { c =>
      require(!right.columns.contains(c),
        s"right input already has a '$c' column (reserved by AsOf.forward)")
    }
    val r2 = right.select((partitionCols :+ timeCol).map(col) :+
      col(rightTie).as("_tie") :+
      struct(col(timeCol).as("_t") +: payloadCols.map(col): _*)
        .as("_payload"): _*)
      .withColumn("_tag", lit(1))
    val payType = r2.schema("_payload").dataType
    val l2 = left
      .withColumn("_tie", col(leftTie))
      .withColumn("_payload", lit(null).cast(payType))
      .withColumn("_tag", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(timeCol), col("_tag"), col("_tie"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = u
      .withColumn("asof", first(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0)
      .drop("_tag", "_tie", "_payload")
    toleranceUs match {
      case None => matched
      case Some(t) => matched.withColumn("asof",
        when(col("asof").isNotNull &&
          col("asof._t") - col(timeCol) <= t, col("asof")))
    }
  }
}

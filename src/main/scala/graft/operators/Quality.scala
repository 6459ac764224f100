package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Declarative data-quality expectations (the dbt-test / Great-
  * Expectations pattern): a rule set evaluated into ONE violation report
  * the pipeline gates on before trusting an extract.
  *
  * Scale shape: every row-local rule (not-null / accepted-values / range)
  * is a conditional SUM in a single shared aggregation — one scan of the
  * table for the whole rule set, map-side combined, whatever the rule
  * count. Uniqueness is not row-local (it needs a cardinality), so each
  * unique rule runs as its own column-pruned two-column aggregate (the
  * [[TableOps.profileBatched]] discipline — a parquet scan of ONE column,
  * never a row multiplication). The report itself is O(#rules) rows.
  */
object Quality {

  sealed trait Expectation { def rule: String; def column: String }
  /** `column` must not be NULL. */
  case class ExpectNotNull(column: String) extends Expectation {
    val rule = "not_null"
  }
  /** `column` must have no duplicate non-NULL values. Violations = the
    * number of EXTRA rows (non-null count − distinct count). */
  case class ExpectUnique(column: String) extends Expectation {
    val rule = "unique"
  }
  /** `column` (compared as a string — the profile operator's injective-
    * cast convention) must be NULL or one of `values`. */
  case class ExpectAccepted(column: String, values: Seq[String]) extends Expectation {
    val rule = "accepted_values"
  }
  /** `column` must be NULL or in [lo, hi]. */
  case class ExpectRange(column: String, lo: Long, hi: Long) extends Expectation {
    val rule = "range"
  }

  /** Evaluates `rules` over `df`. Output one row per rule:
    * (rule, col_name, n_rows, n_violations, pass), ordered by
    * (rule, col_name) — NULL values never violate accepted/range rules
    * (that is not-null's job), matching SQL three-valued predicates. */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    rules.foreach(r => require(df.columns.contains(r.column),
      s"${r.rule}: no such column '${r.column}'"))
    // column names are spliced into a stack() literal below — reject
    // anything that could escape the quote
    rules.foreach(r => require(r.column.matches("[A-Za-z0-9_]+"),
      s"expectations: column name '${r.column}' must be [A-Za-z0-9_]+"))
    val keys = rules.map(r => (r.rule, r.column))
    require(keys.distinct.size == keys.size,
      s"duplicate (rule, column) pairs: ${keys.diff(keys.distinct).mkString(", ")}")

    val (uniques, rowLocal) = rules.partition(_.isInstanceOf[ExpectUnique])

    val rowLocalReport: Option[DataFrame] = if (rowLocal.isEmpty) None else {
      val aggs = rowLocal.zipWithIndex.map { case (r, i) =>
        val bad = r match {
          case ExpectNotNull(c) => col(c).isNull
          case ExpectAccepted(c, vs) =>
            col(c).isNotNull && !col(c).cast(StringType).isin(vs: _*)
          case ExpectRange(c, lo, hi) =>
            col(c).isNotNull && (col(c) < lo || col(c) > hi)
          case u: ExpectUnique => sys.error(s"unreachable: $u")
        }
        sum(when(bad, 1L).otherwise(0L)).as(s"__v$i")
      }
      val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
      // unpivot the single aggregate row to the long report — stack() is
      // a Generate over ONE row, not a row-multiplying Expand
      val stackArgs = rowLocal.zipWithIndex.map { case (r, i) =>
        s"'${r.rule}', '${r.column}', __v$i"
      }.mkString(", ")
      Some(one.select(col("__n").as("n_rows"),
          expr(s"stack(${rowLocal.size}, $stackArgs) AS (rule, col_name, n_violations)"))
        .select(col("rule"), col("col_name"), col("n_rows"), col("n_violations")))
    }

    val uniqueReports = uniques.map { case u: ExpectUnique =>
      df.select(col(u.column))
        .agg(count(lit(1)).as("n_rows"), count(col(u.column)).as("__nn"),
          count_distinct(col(u.column)).as("__nd"))
        .select(lit(u.rule).as("rule"), lit(u.column).as("col_name"),
          col("n_rows"), (col("__nn") - col("__nd")).as("n_violations"))
      case other => sys.error(s"unreachable: $other")
    }

    (rowLocalReport.toSeq ++ uniqueReports)
      .reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule", "col_name")
  }

  /** Referential-integrity expectation (dbt's `relationships` test) —
    * the cross-table rule [[expectations]]' single-table grammar can't
    * express: every non-NULL `childCol` value must exist in
    * `parent.parentCol`. Same report shape as [[expectations]]
    * ((rule, col_name, n_rows, n_violations, pass), one row), so the
    * two compose by plain union into one quality report. NULL foreign
    * keys never violate (the optional-reference convention, matching
    * the NULL handling of accepted/range rules). Cost: one left join
    * against the DISTINCT parent-key set (broadcast when small) + one
    * aggregate — the orphan COUNT, not an orphan materialization. */
  def referential(child: DataFrame, childCol: String,
                  parent: DataFrame, parentCol: String): DataFrame = {
    require(child.columns.contains(childCol), s"unknown child column $childCol")
    require(parent.columns.contains(parentCol), s"unknown parent column $parentCol")
    child.select(col(childCol).as("__fk"))
      .join(parent.select(col(parentCol).as("__fk"))
        .filter(col("__fk").isNotNull).distinct()
        .withColumn("__hit", lit(1L)), Seq("__fk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__fk").isNotNull && col("__hit").isNull, 1L)
          .otherwise(0L)).as("__viol"))
      .select(lit("relationship").as("rule"), lit(childCol).as("col_name"),
        col("n_rows"), coalesce(col("__viol"), lit(0L)).as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }
}

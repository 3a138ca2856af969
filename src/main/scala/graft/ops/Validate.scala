package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates — the profile/constraint pass every production
  * pipeline runs before (and after) a 100 TB transform (the
  * Deequ/Great-Expectations operator family, rebuilt as plain Spark
  * aggregates so Catalyst fuses the whole audit into ONE scan).
  *
  * [[profile]] computes per-column completeness/cardinality/range stats;
  * [[checkViolations]] counts rows violating declared constraints;
  * [[referentialViolations]] counts foreign-key orphans. All return
  * DataFrames so gates compose with the rest of a plan (e.g. abort a
  * write when `n_violations > 0`, or publish the profile next to the
  * dataset as freshness metadata).
  */
object Validate {

  /** One-scan column profile: for each named column — row count, null
    * count, exact distinct count, min/max (cast to string so mixed-type
    * profiles share one schema). All measures are plain aggregate
    * expressions in a single `agg`, so the source is read ONCE; the
    * per-column rows are unpivoted from the 1-row result with `stack`
    * (a bounded values-generator, not a shuffle). At extreme cardinality
    * swap `countDistinct` for `approx_count_distinct` (a14's pattern) —
    * the exact form is kept here because the driver oracle checks it. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      countDistinct(col(c)).as(s"__dist_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, " + cols.map(c =>
        s"'$c', __n, `__null_$c`, `__dist_$c`, `__min_$c`, `__max_$c`")
        .mkString(", ") +
        ") as (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"))
  }

  /** Two-snapshot profile drift — the schema/stat regression report a
    * pipeline runs between yesterday's and today's partition before
    * promoting (null-rate spikes, cardinality collapses and range
    * excursions are the classic silent upstream breakages; [[graft.evalx
    * .Metrics.psi]] covers distribution SHAPE, this covers the profile
    * surface). Composes two one-scan [[profile]]s and joins the ≤|cols|
    * result rows — cost is two scans regardless of width.
    * Output: one row per column with both sides' null fraction /
    * distinct count, the null-fraction delta, and a range-changed
    * flag (null-safe min/max comparison). */
  def profileDrift(base: DataFrame, current: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) = profile(df, cols)
      .select(col("col_name"),
        round(col("n_nulls").cast("double") / col("n_rows"), 6)
          .as(s"null_frac_$tag"),
        col("n_distinct").as(s"distinct_$tag"),
        col("min_val").as(s"min_$tag"), col("max_val").as(s"max_$tag"))
    side(base, "base").join(side(current, "cur"), "col_name")
      .select(col("col_name"), col("null_frac_base"), col("null_frac_cur"),
        round(abs(col("null_frac_cur") - col("null_frac_base")), 6)
          .as("null_frac_delta"),
        col("distinct_base"), col("distinct_cur"),
        (not(col("min_base") <=> col("min_cur")) ||
          not(col("max_base") <=> col("max_cur"))).as("range_changed"))
  }

  /** Violation counts for named row-level constraints (each a boolean
    * Column that valid rows satisfy; NULL predicate results count as
    * violations — an unevaluable constraint is a failing one). One scan,
    * one row per check. */
  def checkViolations(df: DataFrame, checks: Seq[(String, Column)])
      : DataFrame = {
    val aggs = checks.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$name")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${checks.size}, " + checks.map { case (n, _) =>
        s"'$n', `__v_$n`" }.mkString(", ") +
        ") as (check_name, n_violations)"))
  }

  /** Foreign-key orphan count: rows of `df` whose `key` has no match in
    * `dim.refKey` (nulls excluded — null-ness is [[checkViolations]]'
    * job). Lowered as a left-anti join, so Spark broadcasts the dim side
    * when small and degrades to a shuffled anti-join when not. */
  def referentialViolations(df: DataFrame, key: String, dim: DataFrame,
      refKey: String, name: String): DataFrame =
    df.where(col(key).isNotNull)
      .join(dim.select(col(refKey)).distinct(), col(key) === col(refKey),
        "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))
}

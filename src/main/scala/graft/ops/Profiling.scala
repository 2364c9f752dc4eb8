package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Profiling / stats aggregations (SURVEY.md §2.4, A1-A5).
  *
  * Every stat here is a single distributed aggregate over the data — one
  * pass, map-side partial aggregation, a scalar per column back to the
  * driver. That shape (tiny driver-side result, full scan stays on
  * executors) is what makes the data-dependent schema rules viable at
  * 100 TB.
  */
object Profiling {

  /** A2 — per-column null counts (`df.isnull().sum()`,
    * ecommerce_s3_to_pg.py:42-43): one row, one column per input column. */
  def nullCounts(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      sum(qcol(c).isNull.cast("long")).as(c)).toSeq: _*)

  /** A5 companion — per-column NON-null counts, used to drop all-null
    * columns (`dropna(axis=1, how='all')`, ecommerce_s3_to_pg.py:202-203). */
  def nonNullCounts(df: DataFrame): Map[String, Long] = {
    if (df.columns.isEmpty) return Map.empty
    val row: Row = df.select(df.columns.map(c =>
      count(qcol(c)).as(c)).toSeq: _*).head()
    df.columns.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** A5 — drop columns whose non-null count is zero. One stats action, then
    * a plain projection. */
  def dropAllNullColumns(df: DataFrame): DataFrame = {
    val counts = nonNullCounts(df)
    val keep = df.columns.filter(c => counts.getOrElse(c, 0L) > 0L)
    df.select(keep.map(qcol).toSeq: _*)
  }

  /** A1 — profiling summary in the spirit of `df.describe(include='all')`
    * (`inspect_df`, ecommerce_s3_to_pg.py:31-43): count / distinct / nulls
    * per column, plus min/max rendered as strings so one schema fits all
    * column types. */
  def profile(df: DataFrame): DataFrame = {
    val perCol = df.columns.map { c =>
      df.select(
        lit(c).as("column"),
        count(qcol(c)).as("non_null"),
        sum(qcol(c).isNull.cast("long")).as("nulls"),
        countDistinct(qcol(c)).as("distinct"),
        min(qcol(c)).cast("string").as("min"),
        max(qcol(c)).cast("string").as("max"))
    }
    perCol.reduce(_.unionAll(_))
  }
}

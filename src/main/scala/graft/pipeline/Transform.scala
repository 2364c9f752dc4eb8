package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.ops.{qcol, Profiling, Projections, ScalarFns}

/** The generic cleaning chain (`transform`, ecommerce_s3_to_pg.py:123-214) —
  * the heart of reference parity. Stage order is load-bearing (SURVEY.md
  * §3.3 / §7.4):
  *
  *  a. P2 normalize column names
  *  b. per column: F4 date-parse (`date` in name) → F5 month normalize
  *     (`month` in name, column-level two-strategy) → F6 currency scrub
  *     with the >90% adoption rule (string columns)
  *  c. F3 trim remaining string columns
  *  d. F7 NA-sentinel normalization (after trim, so `' '` → `''` is caught)
  *  e. A5 drop all-null columns
  *
  * The data-dependent decisions (F5 strategy, F6 adoption, A5 drop) cannot
  * be one lazy plan: they are resolved by exactly TWO distributed aggregate
  * actions — one pre-projection stats pass (per-column parse/convert counts,
  * all fused into a single aggregate) and one post-projection non-null-count
  * pass — each returning one tiny row to the driver. The scan itself stays
  * distributed, so the chain holds at 100 TB.
  */
object Transform {

  def apply(df0: DataFrame): DataFrame = {
    val df = Projections.normalizeColumnNames(df0)
    val n = df.columns.length

    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet

    val dateCols = df.columns.filter(_.contains("date")).toSeq
    val monthCols = df.columns.filter(_.contains("month")).toSeq
    // F6 candidates: string-typed columns (the reference's `object` dtype
    // loop) that aren't already converted by the date pass. Month columns
    // re-enter as month-name strings and simply fail numeric conversion,
    // like in the reference.
    val numericCandidates = df.columns
      .filter(c => stringCols.contains(c) && !dateCols.contains(c)).toSeq

    // ---- stats pass 1: one fused aggregate --------------------------------
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        monthCols.map(c =>
          ScalarFns.monthParseableCount(qcol(c)).as(s"__month_$c")) ++
        numericCandidates.map(c =>
          count(ScalarFns.numericScrub(qcol(c))).as(s"__num_$c"))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    def stat(name: String): Long = stats.getLong(stats.fieldIndex(name))
    val total = stat("__n")

    // ---- build the projection from the collected stats --------------------
    val projected = df.columns.foldLeft(df) { (d, c) =>
      if (dateCols.contains(c)) {
        d.withColumn(c, ScalarFns.parseDate(qcol(c)))
      } else if (monthCols.contains(c)) {
        // column-level strategy pick (reference :160 `.notna().any()`)
        if (stat(s"__month_$c") > 0)
          d.withColumn(c, ScalarFns.monthFromDatetime(qcol(c)))
        else d.withColumn(c, ScalarFns.monthFromPrefix(qcol(c)))
      } else if (numericCandidates.contains(c)
          && total > 0 && stat(s"__num_$c") > 0.9 * total) {
        d.withColumn(c, ScalarFns.numericScrubRounded(qcol(c)))
      } else d
    }

    // c. trim surviving string columns, d. sentinel → NULL
    val cleaned = ScalarFns.sentinelsToNull(
      ScalarFns.trimStringCols(projected))

    // e. A5 — stats pass 2 on the final projection
    Profiling.dropAllNullColumns(cleaned)
  }
}

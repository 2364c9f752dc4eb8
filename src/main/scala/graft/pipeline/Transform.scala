package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.ops.{qcol, CacheScope, Projections, ScalarFns}

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
  * be one lazy plan — but they CAN be one distributed aggregate: the fused
  * stats pass below computes, per column, the counts for EVERY possible
  * outcome (datetime-parseable months AND prefix-mapped months, adopted
  * numerics AND kept-string survivors), so strategy pick, adoption, and
  * the A5 column drop all resolve from a single tiny driver-side row.
  * One stats action + the caller's action = exactly two passes over the
  * input, which is persisted (memory-then-disk) across them so upstream
  * shuffles (e.g. a preceding dedup) never re-execute. The cache is
  * registered with [[CacheScope]] — callers release it deterministically
  * after their materializing action, so per-micro-batch / per-rep
  * invocations never accumulate storage.
  */
object Transform {

  def apply(df0: DataFrame): DataFrame = {
    val norm = Projections.normalizeColumnNames(df0)
    val baseCols = norm.columns.toSeq

    val stringCols = norm.schema.fields
      .filter(_.dataType == StringType).map(_.name).toSet
    val dateCols = baseCols.filter(_.contains("date"))
    val monthCols = baseCols
      .filter(c => c.contains("month") && !dateCols.contains(c))
    // F6 candidates: string-typed columns (the reference's `object` dtype
    // loop) not already converted by the date pass. Month columns re-enter
    // as month-name strings and simply fail numeric conversion, like in
    // the reference.
    val numericCandidates = baseCols
      .filter(c => stringCols.contains(c) && !dateCols.contains(c)
        && !monthCols.contains(c))
    val passThrough = baseCols.filterNot(c =>
      dateCols.contains(c) || monthCols.contains(c)
        || numericCandidates.contains(c))

    // ---- candidate columns, computed ONCE into the scope cache ------------
    // The heavy conversion expressions (multi-format date parse, both
    // month strategies, numeric scrub, stripped-sentinel survivor) used
    // to run TWICE over the input — once inside the stats aggregate and
    // again in the final projection (r14's two cheapest benched stages).
    // Precomputing them as extra cached columns evaluates each exactly
    // once: the stats pass and the final projection both read the cached
    // value. The cache row widens by the candidate columns; conversion
    // CPU (the dominant per-pass cost — regex dispatch + real parses)
    // halves. Helper names carry the "__cand" prefix and never escape:
    // both return branches select `baseCols` only.
    def d(c: String) = s"__cand_d_$c"
    def ma(c: String) = s"__cand_ma_$c"
    def mb(c: String) = s"__cand_mb_$c"
    def num(c: String) = s"__cand_num_$c"
    def keep(c: String) = s"__cand_keep_$c"
    val candCols: Seq[Column] =
      dateCols.map(c => ScalarFns.parseDate(qcol(c)).as(d(c))) ++
        monthCols.flatMap(c => Seq(
          ScalarFns.monthFromDatetime(qcol(c)).as(ma(c)),
          ScalarFns.monthFromPrefix(qcol(c)).as(mb(c)))) ++
        numericCandidates.flatMap(c => Seq(
          ScalarFns.numericScrub(qcol(c)).as(num(c)),
          ScalarFns.sentinelToNull(ScalarFns.strip(qcol(c))).as(keep(c))))
    val df = CacheScope.persist(
      norm.select(baseCols.map(qcol) ++ candCols: _*))

    // ---- the single fused stats pass --------------------------------------
    val statAggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++
        dateCols.map(c => count(qcol(d(c))).as(s"__date_$c")) ++
        monthCols.flatMap(c => Seq(
          count(qcol(ma(c))).as(s"__ma_$c"),
          count(qcol(mb(c))).as(s"__mb_$c"))) ++
        numericCandidates.flatMap(c => Seq(
          count(qcol(num(c))).as(s"__num_$c"),
          count(qcol(keep(c))).as(s"__keep_$c"))) ++
        passThrough.map(c => count(qcol(c)).as(s"__nn_$c"))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head()
    def stat(name: String): Long = stats.getLong(stats.fieldIndex(name))
    val total = stat("__n")

    // ---- resolve decisions + final non-null count per column --------------
    def monthStrategyA(c: String): Boolean = stat(s"__ma_$c") > 0
    def adopted(c: String): Boolean =
      total > 0 && stat(s"__num_$c") > 0.9 * total
    def finalNonNull(c: String): Long =
      if (dateCols.contains(c)) stat(s"__date_$c")
      else if (monthCols.contains(c))
        (if (monthStrategyA(c)) stat(s"__ma_$c") else stat(s"__mb_$c"))
      else if (numericCandidates.contains(c))
        (if (adopted(c)) stat(s"__num_$c") else stat(s"__keep_$c"))
      else stat(s"__nn_$c")

    // ---- build the projection from the precomputed candidates -------------
    // identical values to recomputing the expressions here (same input
    // column, same expression, evaluated at fill time instead)
    val projected = baseCols.foldLeft(df: DataFrame) { (dd, c) =>
      if (dateCols.contains(c)) dd.withColumn(c, qcol(d(c)))
      else if (monthCols.contains(c)) {
        // column-level strategy pick (reference :160 `.notna().any()`)
        if (monthStrategyA(c)) dd.withColumn(c, qcol(ma(c)))
        else dd.withColumn(c, qcol(mb(c)))
      } else if (numericCandidates.contains(c) && adopted(c)) {
        // numericScrubRounded ≡ round(numericScrub, 2)
        dd.withColumn(c, round(qcol(num(c)), 2))
      } else if (numericCandidates.contains(c)) {
        // kept as string: final value is sentinelToNull(strip(c)) — the
        // cached keep column IS that expression; the shared trim+sentinel
        // pass below is then a no-op on it (already stripped, sentinels
        // already nulled), preserving the original stage order's values
        dd.withColumn(c, qcol(keep(c)))
      } else dd
    }.select(baseCols.map(qcol): _*)

    // c. trim surviving string columns, d. sentinel → NULL
    val cleaned = ScalarFns.sentinelsToNull(
      ScalarFns.trimStringCols(projected))

    // e. A5 — resolved from the same stats row (empty input: keep schema)
    if (total == 0) cleaned
    else cleaned.select(
      baseCols.filter(c => finalNonNull(c) > 0L).map(qcol): _*)
  }
}

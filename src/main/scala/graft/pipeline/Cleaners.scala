package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{CacheScope, Dedup, OrderedSplit, Projections, ScalarFns}

/** The three per-class cleaning pipelines (SURVEY.md §3.2-3.3), stage
  * orders exactly as the reference runs them.
  */
object Cleaners {

  /** `clean_amazon_sale` (ecommerce_s3_to_pg.py:216-296) →
    * (clean, flaggedDuplicates). Pass `cacheSplit = true` when BOTH
    * returned frames will be materialized (the loaders do) — the D2
    * window and its upstream then execute once, scope-cached. */
  def amazon(df0: DataFrame, cacheSplit: Boolean = false)
      : (DataFrame, DataFrame) = {
    val dropCols = Seq("Unnamed: 22", "promotion-ids", "fulfilled-by",
      "Style", "currency", "index")
    val toStandardize = Seq("Status", "Courier Status", "Fulfilment",
      "B2B", "ship-state", "ship-city")
    val critical = Seq("order_id", "amount", "date", "quantity",
      "status", "fulfillment")

    val prepared = df0
      .transform(Projections.dropColumns(dropCols))            // P1
      .transform(ScalarFns.lowerTrimCols(toStandardize))       // F2
      .transform(Projections.renameColumns(
        Map("Fulfilment" -> "fulfillment", "Qty" -> "quantity"))) // P3
      .transform(Dedup.dropDuplicateRows)                      // D1
      .transform(Projections.rowNullRatioBelow(0.5))           // P4

    val transformed = Transform(prepared)                      // §3.3 step 6
      .transform(Projections.dropRowsNullIn(critical))         // P5

    if (transformed.columns.contains("order_id"))
      Dedup.conflictSplit("order_id", cacheSplit)(transformed) // D2
    else (transformed, transformed.limit(0))
  }

  /** `clean_sale` (ecommerce_s3_to_pg.py:298-335). */
  def sale(df0: DataFrame): DataFrame =
    df0
      .transform(Projections.dropColumns(Seq("index")))        // P1
      .transform(Dedup.dropDuplicateRows)                      // D1
      .transform(Projections.rowNullRatioBelow(0.5))           // P4
      .transform(Transform.apply)
      .transform(Projections.renameColumns(
        Map("design_no." -> "design_no")))                     // P3

  /** `clean_international_sale` (ecommerce_s3_to_pg.py:337-421) →
    * (part1, part2). The embedded-header split: the first all-alphabetic
    * row (P6) re-headers everything after it. Requires `df0` to carry file
    * row order; callers attach it via [[OrderedSplit.withRowIndex]] at read
    * time. Implements the *intent* of the reference's dead
    * `gross_amt`→`gross_amount` rename on part 2 (SyntaxError at :396-398 —
    * see SURVEY.md defects).
    */
  def international(df0: DataFrame): (DataFrame, DataFrame) = {
    val idx = "__row_idx"
    val indexed = if (df0.columns.contains(idx)) df0
      else OrderedSplit.withRowIndex(df0)

    val dataCols = indexed.columns.filterNot(_ == idx).toSeq
    // Persisted (scope-released): the O1 split takes two driver actions
    // (pivot min + pivot row) and each part's Transform takes a stats
    // action — without the cache the D1 dedup shuffle would re-execute
    // for every one of those five consumers.
    val prepared = CacheScope.persist(indexed
      .transform(Dedup.dropDuplicateRowsKeepingFirst(dataCols, idx)) // D1
      .transform(Projections.rowNullRatioBelow(0.5, Seq(idx))) // P4
      .transform(Projections.dropColumns(Seq("index")))        // P1
      .transform(Projections.renameColumns(
        Map("GROSS AMT" -> "gross_amount"))))                  // P3

    val cols = prepared.columns.filterNot(_ == idx).toSeq
    val (part1Raw, part2RawOpt) = OrderedSplit.embeddedHeaderSplit(
      prepared, cols, Projections.allAlphabetic(cols), idx)    // O1

    val part1 = part1Raw
      .transform(Transform.apply)
      .transform(ScalarFns.upperTrimKeywordCols())             // F1

    val part2 = part2RawOpt match {
      case Some(p2) =>
        p2.transform(Projections.normalizeColumnNames)         // P2
          .transform(Projections.renameColumns(
            Map("gross_amt" -> "gross_amount")))               // P3 (intent)
          .transform(Transform.apply)
          .transform(ScalarFns.upperTrimKeywordCols())         // F1
      case None => part1.limit(0)
    }
    (part1, part2)
  }

  /** O2 target schema for the international sink
    * (ecommerce_s3_to_pg.py:584-588). */
  val internationalTargetCols: Seq[String] = Seq(
    "customer", "date", "months", "style", "sku", "pcs", "rate",
    "gross_amount", "size", "stock")
}

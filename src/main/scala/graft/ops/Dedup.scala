package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication / key-conflict operators (SURVEY.md §2.5, D1-D2). */
object Dedup {

  /** D1 — full-row dedup (`drop_duplicates()`, ecommerce_s3_to_pg.py:252).
    * One hash shuffle on all columns; AQE coalesces post-shuffle
    * partitions. */
  def dropDuplicateRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** D1 variant for order-carrying frames: dedup on the data columns only,
    * keeping the first occurrence in file order (the pandas
    * `drop_duplicates()` contract when a positional index rides along).
    *
    * When `subset` covers every column except the order column — the
    * whole-row case both cleaners use — the kept row IS its group key, so
    * a hash aggregate (`groupBy(subset).min(order)`) reproduces keep-first
    * exactly with map-side partial aggregation and NO sort. Only when
    * extra non-key columns must survive from the kept row does the
    * sort-based window run. */
  def dropDuplicateRowsKeepingFirst(subset: Seq[String], orderCol: String)(
      df: DataFrame): DataFrame = {
    val others =
      df.columns.filterNot(c => subset.contains(c) || c == orderCol)
    if (others.isEmpty) {
      df.groupBy(subset.map(qcol): _*)
        .agg(min(qcol(orderCol)).as(orderCol))
        .select(df.columns.toSeq.map(qcol): _*)
    } else {
      val w = Window.partitionBy(subset.map(qcol): _*).orderBy(qcol(orderCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  /** D2 — key-conflict split (ecommerce_s3_to_pg.py:274-289): rows whose
    * key occurs more than once go *entirely* to the flagged side; only
    * singleton keys stay clean. One window count over a single hash shuffle
    * on the key — the reference's only true window aggregation.
    *
    * Returns (clean, flagged). `cacheBothSides` persists the counted
    * frame through [[CacheScope]] so consumers that materialize BOTH
    * sides (the batch/stream loaders) run the window and its upstream
    * once instead of once per side; single-side consumers leave it off.
    */
  def conflictSplit(key: String, cacheBothSides: Boolean = false)(
      df: DataFrame): (DataFrame, DataFrame) = {
    val counted0 = df.withColumn(
      "__key_count", count(lit(1)).over(Window.partitionBy(qcol(key))))
    val counted = if (cacheBothSides) CacheScope.persist(counted0) else counted0
    val clean = counted.filter(col("__key_count") === 1).drop("__key_count")
    val flagged = counted.filter(col("__key_count") > 1).drop("__key_count")
    (clean, flagged)
  }
}

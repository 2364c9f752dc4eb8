package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier-quality evaluation over a scored, labeled corpus: binned
  * ROC-AUC and a calibration (reliability) table. The missing half of a
  * quality-filter loop — [[TextStats.hashedLinearScore]] produces the
  * scores, the curation gates produce reference labels, and these two
  * report whether the cheap classifier actually ranks/calibrates
  * against the expensive signal before it gates 100 TB.
  *
  * AUC uses the histogram form of the Mann-Whitney U statistic: bin the
  * score into `bins` fixed buckets, then
  * `U = Σ_b cum_neg(b)·pos(b) + ½·neg(b)·pos(b)` — an approximation
  * whose only error is tie-broadening WITHIN a bucket (exact if the
  * classifier's decisive digits survive the binning). The exact
  * rank-based form needs a global sort of every row; this needs ONE
  * hash aggregate on a bounded key (map-side combine, ≤ `bins` rows
  * out) plus a window over the ≤ `bins`-row histogram — the identical
  * 100 TB shape as the library's other histogram reports. All
  * arithmetic until the final division is on exact longs, so the
  * result is engine-reproducible bit-for-bit.
  */
object ClassifierEval {

  /** One row: `auc` (NULL when a class is empty), `n_pos`, `n_neg`.
    * `scoreCol` must lie in [0, 1] (a probability); `labelCol` is
    * 0/1-castable. */
  def binnedAuc(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 1000): DataFrame = {
    require(bins > 0, "binnedAuc: bins must be positive")
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1))
      .cast("long").as("bin")
    val h = scored
      .select(bin, col(labelCol).cast("long").as("pos"))
      .groupBy(col("bin"))
      .agg(sum(col("pos")).as("pos_n"),
        (count(lit(1)) - sum(col("pos"))).as("neg_n"))
    // negatives strictly below this bucket; the window runs over the
    // <= bins-row histogram, never over documents
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cum_neg", coalesce(sum(col("neg_n")).over(w), lit(0L)))
      .agg(
        sum(col("cum_neg") * col("pos_n")).as("u2"),
        sum(col("neg_n") * col("pos_n")).as("ties"),
        sum(col("pos_n")).as("n_pos"),
        sum(col("neg_n")).as("n_neg"))
      .select(
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((lit(2.0) * col("u2") + col("ties")) /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** One-row fit report: Brier score (mean squared probability error)
    * and expected calibration error (ECE over `bins` equal-width score
    * buckets), plus the doc count. Everything stays EXACT until the
    * final divisions: scores are 6-dp decimals, so (score − label)² is
    * an exact DECIMAL(·,12), and the ECE numerator Σ_b |n_pos_b −
    * Σscore_b| is an exact DECIMAL(·,6) — no order-dependent double
    * summation anywhere (the [[graft.Det]] discipline). Scale shape:
    * two bounded-key aggregates over one scan each (Brier global, ECE
    * per-bucket) joined as 1×1 rows. */
  def fitReport(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "fitReport: bins must be positive")
    val s = col(scoreCol).cast(DecimalType(18, 6))
    val posL = col(labelCol).cast("long")
    val err = s - posL.cast(DecimalType(18, 6))
    val brier = scored
      .select((err * err).as("sq"), lit(1L).as("one"))
      .agg(sum(col("sq")).as("sq_sum"), sum(col("one")).as("n"))
      .select(
        round(col("sq_sum").cast("double") / col("n"), 6).as("brier"),
        col("n").as("n_docs"))
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1))
      .cast("long").as("bin")
    val ece = scored
      .select(bin, s.as("s"), posL.as("pos"))
      .groupBy(col("bin"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("s")).as("sum_score"),
        count(lit(1)).as("n_docs"))
      .agg(
        sum(abs(col("n_pos").cast(DecimalType(38, 6)) - col("sum_score")))
          .as("ece_num"),
        sum(col("n_docs")).as("n"))
      .select(round(col("ece_num").cast("double") / col("n"), 6).as("ece"))
    brier.crossJoin(ece).select(col("brier"), col("ece"), col("n_docs"))
  }

  /** Reliability table: one row per score decile (or `bins`-ile) with
    * document count, positive count, mean predicted score (exact
    * decimal mean) and observed positive rate — the calibration curve's
    * data. Same bounded-histogram scale shape as [[binnedAuc]]. */
  def calibrationBins(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "calibrationBins: bins must be positive")
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1))
      .cast("long").as("bin")
    scored
      .select(bin, col(scoreCol).as("s"),
        col(labelCol).cast("long").as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pos")).as("n_pos"),
        round(sum(col("s").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1)), 6).as("mean_score"))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n_docs"), 6))
  }
}

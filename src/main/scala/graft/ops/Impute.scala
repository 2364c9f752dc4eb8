package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Missing-value imputation — the feature-engineering staple between
  * cleaning (sentinels → NULL, [[ScalarFns.sentinelsToNull]]) and
  * training: fill numeric holes with the group mean, categorical holes
  * with the group mode, and FLAG every filled cell (models treat
  * "imputed" as signal; silently invented values are a correctness
  * hazard).
  *
  * Both fills are group-grained aggregates joined back onto the
  * row-grained frame — one hash aggregate plus one equi-join each, no
  * window, no driver-side value table. At 100 TB the aggregate output
  * is |groups| rows; Spark broadcasts it into the join when small.
  */
object Impute {

  /** Fill NULLs in numeric `valueCol` with the 6-dp-rounded mean of the
    * column's NON-null values in the same `byCols` group (exact decimal
    * sum / non-null count — engine-reproducible). Appends
    * `<valueCol>_filled` and INT 0/1 `<valueCol>_imputed`; an all-null
    * group has no mean, so its holes stay NULL (flagged). */
  def meanFill(df: DataFrame, valueCol: String,
      byCols: Seq[String]): DataFrame = {
    val v = qcol(valueCol)
    val fills = df.groupBy(byCols.map(qcol): _*)
      .agg(round(sum(v.cast(DecimalType(18, 2))).cast("double") / count(v), 6)
        .as(s"__fill_$valueCol"))
    df.join(fills, byCols)
      .withColumn(s"${valueCol}_filled",
        coalesce(v, col(s"__fill_$valueCol")))
      .withColumn(s"${valueCol}_imputed", v.isNull.cast("int"))
      .drop(s"__fill_$valueCol")
  }

  /** Fill NULLs in categorical `valueCol` with the group MODE, elected
    * WITHOUT a window: per-(group, value) counts, then
    * `max(struct(count, value))` — ties break toward the larger value,
    * totally ordered, so the fill is deterministic on any engine and
    * partitioning. Appends `<valueCol>_filled` / `<valueCol>_imputed`. */
  def modeFill(df: DataFrame, valueCol: String,
      byCols: Seq[String]): DataFrame = {
    val v = qcol(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy((byCols :+ valueCol).map(qcol): _*)
      .agg(count(lit(1)).as("__c"))
    val modes = counts.groupBy(byCols.map(qcol): _*)
      .agg(max(struct(col("__c"), v)).getField(valueCol)
        .as(s"__mode_$valueCol"))
    // left: a group whose values are ALL null has no mode row at all —
    // its rows must survive (unfilled, flagged), not drop
    df.join(modes, byCols, "left")
      .withColumn(s"${valueCol}_filled",
        coalesce(v, col(s"__mode_$valueCol")))
      .withColumn(s"${valueCol}_imputed", v.isNull.cast("int"))
      .drop(s"__mode_$valueCol")
  }
}

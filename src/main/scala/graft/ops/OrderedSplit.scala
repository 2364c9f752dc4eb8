package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Ordered-row / positional operators (SURVEY.md §2.6, O1-O2) — the
  * embedded-header table split of `clean_international_sale`
  * (ecommerce_s3_to_pg.py:364-393).
  */
object OrderedSplit {

  /** Attach a file-order row index. `monotonically_increasing_id` is
    * (partitionId << 33) + offset; for a single splittable file Spark's
    * partitions are laid out in file-offset order, so the id is monotone in
    * file position — the contract O1 needs — without collapsing to one
    * partition. The absolute values are not dense; only their order is used.
    */
  def withRowIndex(df: DataFrame, idxCol: String = "__row_idx"): DataFrame =
    df.withColumn(idxCol, monotonically_increasing_id())

  /** O1 — embedded-header split. Scans rows in order; the first row
    * matching `pivotPred` (reference: every cell alphabetic, P6) starts a
    * second embedded table. part1 = rows strictly before the pivot (original
    * header); part2 = rows strictly after it, re-headered positionally by
    * the pivot row's cell values. No pivot → everything is part1
    * (ecommerce_s3_to_pg.py:381-382).
    *
    * ONE tiny driver action: `min` of the index and `min_by` of the row
    * struct come back in the same aggregate (a second pass to re-fetch
    * the pivot row would re-execute the upstream lineage once more per
    * call — measurable in the per-micro-batch streaming path). The row
    * data itself never leaves the executors.
    */
  def embeddedHeaderSplit(
      dfWithIdx: DataFrame,
      dataCols: Seq[String],
      pivotPred: Column,
      idxCol: String = "__row_idx"): (DataFrame, Option[DataFrame]) = {
    val pivotIdxRow = dfWithIdx.filter(pivotPred)
      .agg(min(qcol(idxCol)).as("k"),
        min_by(struct(dataCols.map(qcol): _*), qcol(idxCol)).as("row"))
      .head()
    if (pivotIdxRow.isNullAt(0)) {
      (dfWithIdx.drop(idxCol), None)
    } else {
      val k = pivotIdxRow.getLong(0)
      val part1 = dfWithIdx.filter(qcol(idxCol) < k).drop(idxCol)
      val pivotRow = pivotIdxRow.getStruct(1)
      val newNames = dataCols.indices.map { i =>
        Option(pivotRow.get(i)).map(_.toString)
          .map(Projections.normalizeName)
          .getOrElse(dataCols(i))
      }
      val part2 = dfWithIdx.filter(qcol(idxCol) > k).drop(idxCol)
        .toDF(newNames: _*)
      (part1, Some(part2))
    }
  }

  /** O2 — schema alignment/padding (ecommerce_s3_to_pg.py:584-588): ensure
    * every target column exists (pad missing with typed NULL), then select
    * in target order. Typed nulls, not NullType — parquet/JDBC sinks reject
    * untyped null columns. */
  def padToSchema(target: Seq[(String, DataType)])(df: DataFrame): DataFrame =
    df.select(target.map { case (name, dt) =>
      if (df.columns.contains(name)) qcol(name).cast(dt).as(name)
      else lit(null).cast(dt).as(name)
    }.toSeq: _*)

  /** O2 string-typed convenience matching the reference's TEXT-heavy DDL. */
  def padToColumns(target: Seq[String])(df: DataFrame): DataFrame =
    padToSchema(target.map(_ -> (StringType: DataType)))(df)
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the single right row with the
  * same key and the greatest `rightTs <= leftTs` (backward, inclusive).
  * An operator the reference (and stock Spark) lacks; the composition
  * here is the scale-correct distributed rewrite rather than any
  * per-key loop:
  *
  *   union(left, right) → one hash shuffle on `keys`
  *                      → one sort per partition on (ts, side)
  *                      → running `last(struct, ignoreNulls)` window
  *
  * That is exactly one Exchange and one Sort for BOTH inputs together —
  * the same cost as a plain sort-merge join — and never builds the
  * (left × right-per-key) candidate blow-up a naive range join would.
  * The right row's payload travels as ONE struct column so the window
  * carry is row-level: a genuinely-NULL field in the matched right row
  * stays NULL instead of leaking an older row's value (per-column
  * `last(ignoreNulls)` would mix rows).
  *
  * Determinism: right rows sort before left rows at equal ts (`>=`
  * inclusive semantics). The caller must make the right side unique per
  * (keys, rightTs) — e.g. pre-aggregate — or ties pick an arbitrary
  * right row (same caveat DuckDB's ASOF JOIN carries).
  *
  * Scale note: one hot key funnels into one task, like any key-window.
  * For a known-skewed key domain, range-repartition by (key, ts) and
  * carry the last right struct across boundary tasks; not needed for
  * the key cardinalities here.
  */
object AsofJoin {

  /** `left` keeps all its columns; `right`'s non-key, non-ts columns are
    * appended (NULL where no right row precedes). Right column names must
    * not collide with left's — rename before joining. */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val rightVals = right.columns.filterNot(c =>
      keys.contains(c) || c == rightTs).toSeq
    val collide = rightVals.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"right value columns collide with left: $collide")
    val leftCols = left.columns.filterNot(c =>
      keys.contains(c) || c == leftTs).toSeq

    val leftTagged = left.select(
      keys.map(qcol) ++
        Seq(qcol(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(
            org.apache.spark.sql.types.StructType(
              rightVals.map(c => right.schema(c)).toArray))
            .as("__rv")) ++
        leftCols.map(qcol): _*)
    // SQL ASOF semantics (and AsofJoinNative's): a right row with a NULL
    // key or NULL ts can never match — unfiltered, the union-window
    // rewrite would group NULL keys together and let a NULL-ts right row
    // (NULLS FIRST under ASC) be carried as a "match" for every left
    // row. Left-side NULLs need no handling: a NULL-key/NULL-ts left row
    // lands in a partition/prefix with no surviving right rows and keeps
    // NULL match columns, exactly like DuckDB's ASOF LEFT JOIN.
    val rightClean = right.filter(
      keys.map(k => qcol(k).isNotNull).reduce(_ && _)
        && qcol(rightTs).isNotNull)
    val rightTagged = rightClean.select(
      keys.map(qcol) ++
        Seq(qcol(rightTs).as("__ts"), lit(0).as("__side"),
          struct(rightVals.map(qcol): _*).as("__rv")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(qcol): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftTagged.unionByName(rightTagged)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        keys.map(qcol) ++ Seq(col("__ts").as(leftTs)) ++ leftCols.map(qcol) ++
          rightVals.map(c => col(s"__rv.$c").as(c)): _*)
  }
}

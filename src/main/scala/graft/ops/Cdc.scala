package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply an ordered change log onto a base
  * snapshot (the lakehouse `MERGE INTO` / Delta CDF "apply changes"
  * semantics, composed from plain Spark primitives).
  *
  * Latest-wins election is WINDOWLESS: base rows ride along as
  * sequence 0 upserts, then ONE hash aggregate per key takes
  * `max(struct(seq, op, payload...))` — struct comparison is
  * lexicographic, and the caller guarantees `seqCol` is unique per key,
  * so only the sequence number ever decides. Map-side partial
  * aggregation shrinks the shuffle to one candidate row per (key,
  * partition); at 100 TB this is a single shuffle on the key, no sort,
  * no per-key reducer funnel. Keys whose winning op is `D` are deleted
  * from the output.
  */
object Cdc {

  /** Merge `changes` (op `U` = upsert, `D` = delete, ordered by
    * `seqCol` within each key) onto `base`. Both frames must carry
    * `keyCols ++ payloadCols`; `changes` additionally carries `seqCol`
    * and `opCol`. Delete rows still need non-null payload placeholders
    * (they never reach the output, but struct comparison is total).
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String,
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val cols: Seq[Column] =
      keyCols.map(qcol) ++ Seq(lit(0L).cast("long").as(seqCol),
        lit("U").as(opCol)) ++ payloadCols.map(qcol)
    val log = base.select(cols: _*).unionByName(
      changes.select((keyCols.map(qcol) ++
        Seq(qcol(seqCol).cast("long").as(seqCol), qcol(opCol)) ++
        payloadCols.map(qcol)): _*))
    val winner = struct((Seq(seqCol, opCol) ++ payloadCols).map(qcol): _*)
    log
      .groupBy(keyCols.map(qcol): _*)
      .agg(max(winner).as("__w"))
      .filter(col("__w").getField(opCol) =!= "D")
      .select(keyCols.map(qcol) ++
        payloadCols.map(c => col("__w").getField(c).as(c)): _*)
  }
}

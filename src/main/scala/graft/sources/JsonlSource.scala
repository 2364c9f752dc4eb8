package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType, StringType}

/** JSONL (newline-delimited JSON) corpus source — the de-facto
  * interchange format for LLM training corpora (one document object per
  * line). Not present in the reference (which is CSV-only, SURVEY.md
  * §2.1); added as part of the training-data extension surface.
  *
  * Scale design:
  * - ALWAYS an explicit schema. Schema inference reads the entire input
  *   once before the real job — at 100 TB that is a full extra pass.
  * - PERMISSIVE mode with a `_corrupt_record` capture column: a corpus
  *   crawl always contains malformed lines, and a fail-fast job that
  *   dies at 99% is worse than one that quarantines. `read` returns
  *   (clean, corrupt) so the caller lands quarantined lines next to the
  *   clean output instead of silently dropping them.
  * - JSONL is splittable line-by-line (unlike multiline JSON), so every
  *   file chunks across executors; compression should be per-file
  *   (gzip whole-file is NOT splittable — document, don't fight).
  */
object JsonlSource {

  val corruptCol = "_corrupt_record"

  /** Read a JSONL path with an enforced schema; returns (clean rows in
    * the declared schema, corrupt lines as (_corrupt_record)). */
  def read(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCapture = StructType(
      schema.fields :+ StructField(corruptCol, StringType, nullable = true))
    // Spark refuses a query that references ONLY the corrupt column of a
    // JSON scan (the parser would need the full row anyway) — the
    // supported pattern is to persist the parsed frame and split it. The
    // cache is registered with CacheScope, so the caller's releaseAll()
    // after its terminal action frees it deterministically.
    val raw = graft.ops.CacheScope.persist(spark.read
      .schema(withCapture)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))
    val clean = raw.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val corrupt = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol))
    (clean, corrupt)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV sources (SURVEY.md §2.1, S2-S5).
  *
  * - S3: UTF-8 read with ISO-8859-1 fallback + full-file type inference
  *   (ecommerce_raw_to_s3.py:95-99, ecommerce_s3_to_pg.py:107-114).
  * - S4: modified-time-window scan — the reference's filename-timestamp
  *   regex is dead code (unformatted `{}` placeholder at :80, see SURVEY.md
  *   defects), so the *effective* semantics is the `LastModified` window at
  *   :94-102; Spark's `modifiedAfter` option is the direct equivalent and
  *   prunes at the file-listing level, before any bytes are read.
  * - S2: filename filter via `pathGlobFilter` — also listing-level pruning.
  */
object CsvSource {

  /** S3 — read CSV with encoding fallback. Spark never throws on undecodable
    * bytes (it substitutes U+FFFD), so "decode error" is detected by probing
    * for replacement characters; on detection the file is re-read as
    * ISO-8859-1, which is what the reference's UnicodeDecodeError fallback
    * produces. */
  def read(
      spark: SparkSession,
      path: String,
      modifiedAfter: Option[String] = None,
      pathGlobFilter: Option[String] = None): DataFrame = {
    def reader(encoding: String) = {
      var r = spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("encoding", encoding)
      modifiedAfter.foreach(ts => r = r.option("modifiedAfter", ts))
      pathGlobFilter.foreach(g => r = r.option("pathGlobFilter", g))
      r
    }
    val utf8 = reader("UTF-8").csv(path)
    val hasGarbage = utf8.columns.exists(_.contains('�')) || {
      import org.apache.spark.sql.functions._
      import graft.ops.qcol
      val strCols = utf8.schema.fields
        .filter(_.dataType == org.apache.spark.sql.types.StringType)
      strCols.nonEmpty && utf8
        .filter(strCols.map(f => qcol(f.name).contains("�"))
          .reduce(_ || _))
        .limit(1).count() > 0
    }
    if (hasGarbage) reader("ISO-8859-1").csv(path) else utf8
  }

  /** S5 — filename classification router (ecommerce_s3_to_pg.py:704-722):
    * substring routing on the lowercase basename. */
  sealed trait FileClass
  case object AmazonSale extends FileClass
  case object InternationalSale extends FileClass
  case object PlainSale extends FileClass
  case object Unrecognized extends FileClass

  def classify(fileName: String): FileClass = {
    val n = fileName.toLowerCase
    if (n.contains("amazon") && n.contains("sale")) AmazonSale
    else if (n.contains("international") && n.contains("sale")) InternationalSale
    else if (n.contains("sale")) PlainSale
    else Unrecognized
  }

  /** S2 — raw-listing filename filter (ecommerce_raw_to_s3.py:74-78): keep
    * `.csv` files containing "sale", skip URL-encoded names. */
  def rawNameFilter(name: String): Boolean =
    name.toLowerCase.contains("sale") && name.endsWith(".csv") &&
      !name.contains("%20")
}

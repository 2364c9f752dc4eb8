package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object ops {
  /** Column reference safe for arbitrary data-derived names (`design_no.`,
    * `Unnamed: 22`, …): backtick-quote so Spark's attribute-name parser
    * treats the whole string as one name part. */
  def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")
}

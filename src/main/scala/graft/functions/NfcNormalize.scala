package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column as a native codegen'd
  * expression.
  *
  * Canonical composition is the first step of every serious text-dedup /
  * fingerprint pipeline: visually identical strings with different
  * codepoint sequences ("é" precomposed U+00E9 vs "e" + combining acute
  * U+0301) must hash identically, or exact dedup silently misses
  * duplicates and near-dup shingles drift. The reference's pandas layer
  * gets this for free only when upstream data is already composed; at
  * corpus scale (web crawls mix normalization forms freely) it has to be
  * an explicit operator.
  *
  * Spark has no built-in for this (`lower`/`trim` are codepoint-wise), so
  * per SURVEY §7.3 preference order this is a custom Expression with
  * `doGenCode`: the generated code stays inside whole-stage codegen (one
  * virtual call into `java.text.Normalizer`, the same ICU-equivalent NFC
  * the JDK ships), no UDF serialization, null-safety inherited from
  * `UnaryExpression`. `isNormalized` (an O(n) scan, true for almost all
  * real text) skips the rewrite and returns the input buffer unchanged —
  * no normalized copy, no UTF-8 re-encode on the common path.
  *
  * Oracle parity: DuckDB's `nfc_normalize()` implements the same Unicode
  * canonical composition, so results hash-match exactly.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"NfcNormalize requires a STRING input, got " +
          child.dataType.catalogString)

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. `isNormalized` first:
    * for already-NFC text (the overwhelming common case) that is one scan
    * and the ORIGINAL UTF8String is returned — no normalized copy, no
    * re-encode back to UTF-8 bytes. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point: `nfc(col)`. */
  def nfc(c: Column): Column = Bridge.toCol(NfcNormalize(Bridge.toExpr(c)))
}

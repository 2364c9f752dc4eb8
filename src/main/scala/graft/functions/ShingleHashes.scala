package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-`n`-gram shingle hashes of a text column, as one native
  * expression: tokenize → n-grams → md5 → first-4-bytes unsigned long →
  * distinct, in a single JVM pass per row.
  *
  * Produces EXACTLY `conv(substring(md5(shingle),1,8),16,10)` for each
  * distinct shingle (the portable hash the DuckDB oracle replicates) —
  * but ~10× faster than the composable
  * `array_distinct(transform(sequence(...), slice/concat_ws))` + md5 HOF
  * chain, which evaluates interpreted per element. This is the MinHash
  * hot loop: at 100 TB every document passes through here once.
  *
  * Codegen: one static call into [[ShingleHashes.compute]] (shared with
  * the interpreted path, so both are bit-identical), keeping the whole
  * enclosing projection inside whole-stage codegen — as a
  * `CodegenFallback` this expression forced every operator fused around
  * it out of generated code.
  *
  * Short documents (< n tokens) yield an empty array — also the DuckDB
  * `generate_series(1, len-n+1)` semantics.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** The Java `\s` set (" \t\n\f\r") — the SAME edge-trim contract
    * as ScalarFns.strip and every tokenizing oracle's char-set trim.
    * Java String.trim would strip ALL code points <= U+0020 (e.g. a
    * leading U+0001), which the oracles' 6-char trim keeps — a
    * control-char-edged doc would shingle differently across engines. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Shared by interpreted eval and generated code. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val raw = input.toString
    var b = 0
    var e = raw.length
    while (b < e && isWs(raw.charAt(b))) b += 1
    while (e > b && isWs(raw.charAt(e - 1))) e -= 1
    val text = raw.substring(b, e)
    val toks = text.split("\\s+")
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (!(toks.length == 1 && toks(0).isEmpty) && toks.length >= n) {
      val md = MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        md.reset()
        val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        out.add(h)
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    ArrayData.toArrayData(arr)
  }

  def shingle_hashes(text: Column, n: Int): Column =
    Bridge.toCol(ShingleHashes(Bridge.toExpr(text), n))
}

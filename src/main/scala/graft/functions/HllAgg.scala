package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over the
  * repo's PORTABLE 32-bit md5 hash ([[graft.ext.TextDedup.baseHash]]) —
  * `approx_count_distinct` for engines that must be REPRODUCIBLE across
  * systems: Spark's built-in HLL++ sketch is implementation-defined,
  * while this one is defined purely by arithmetic on the md5 hash, so
  * the DuckDB oracle recomputes the IDENTICAL register array and the
  * IDENTICAL estimate, and even the approximation hash-matches.
  *
  * Register mapping (p index bits, m = 2^p registers over the 32-bit
  * hash): register = top p bits, w = low (32−p) bits,
  * rho(w) = leading zeros of w in the (32−p)-bit window + 1
  * (= (32−p)+1 when w = 0); each register keeps max(rho). The companion
  * estimator lives in [[graft.ops.IncrementalAgg.hllEstimate]] and uses
  * only exact-in-double arithmetic: every 2^−M term is an exact power of
  * two spanning < 53 bits, so the register sum is the same double in ANY
  * accumulation order — the property that makes the estimate portable.
  *
  * Scale shape: the buffer is m bytes regardless of input size, partial
  * aggregation runs map-side in ObjectHashAggregate, and merge is an
  * elementwise max — the exchange carries m bytes per (group, partition).
  * Unlike [[KmvAgg]] (k smallest hashes, exact under k distinct), HLL
  * keeps a CONSTANT-SIZE buffer with ~1.04/√m relative error — the
  * sketch to persist per shard and merge across a corpus manifest.
  *
  * Cardinality ceiling: the PORTABLE hash is 32-bit, so beyond raw
  * estimates of 2^32/30 the estimator applies the standard large-range
  * correction −2^32·ln(1−raw/2^32) (see
  * [[graft.ops.IncrementalAgg.hllEstimate]]); accuracy still degrades
  * past ~10^8 distinct values as the hash space itself saturates. At
  * manifest scale beyond that, shard the sketch by a partition key
  * (per-source/per-shard sketches whose estimates sum) — portability
  * across engines is the design trade that pins the hash at 32 bits
  * (DuckDB's replay arithmetic is exact only in that range).
  *
  * Output: `array<int>` of the m register values (mergeable artifact).
  */
final class HllBuffer(val m: Int) {
  val regs = new Array[Byte](m)

  def add(reg: Int, rho: Int): Unit =
    if (rho > regs(reg)) regs(reg) = rho.toByte

  def merge(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

case class HllAgg(
    hash: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"HllAgg requires 4 <= p <= 16, got $p")

  private val m = 1 << p
  private val wBits = 32 - p

  override def child: Expression = hash

  override def checkInputDataTypes(): TypeCheckResult =
    hash.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"HllAgg requires a BIGINT hash, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(m)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val h = hash.eval(input)
    if (h != null) {
      // the 32-bit md5-derived hash: top p bits index, low 32-p bits rank
      val hv = h.asInstanceOf[Long] & 0xffffffffL
      val reg = (hv >>> wBits).toInt
      val w = (hv & ((1L << wBits) - 1)).toInt
      val rho =
        if (w == 0) wBits + 1
        else wBits + 1 - (32 - Integer.numberOfLeadingZeros(w))
      buffer.add(reg, rho)
    }
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: HllBuffer): Any = {
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = buffer.regs(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: HllBuffer): Array[Byte] =
    buffer.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(m)
    System.arraycopy(bytes, 0, buf.regs, 0, m)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(hash = newChild)
}

object HllAgg {
  /** `hll_sketch(hash, p)` under `groupBy(...)` — the 2^p register values
    * of the HLL sketch of the distinct hash stream. */
  def hll_sketch(hash: Column, p: Int): Column =
    Bridge.toCol(
      HllAgg(Bridge.toExpr(hash), p).toAggregateExpression())
}

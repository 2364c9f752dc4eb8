package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary heap of (score, id) pairs with the WORST
  * kept element at the root, so admission against a full buffer is one
  * comparison and O(log k) on replace. Ordering: higher score wins; ties
  * break on LOWER id (the similarity family's reproducible total order).
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true if (s1,i1) ranks strictly worse than (s2,i2). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) return
      val s = scores(i); val d = ids(i)
      scores(i) = scores(worst); ids(i) = ids(worst)
      scores(worst) = s; ids(worst) = d
      i = worst
    }
  }

  def add(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs sorted best-first — rank i+1 for element i. */
  def sortedPairs: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** Map-side bounded top-k aggregate — the scale-safe replacement for
  * `row_number().over(Window.partitionBy(query))` ranking.
  *
  * The window form shuffles EVERY scored (query, candidate) row to one
  * task per query before any ranking happens: with Q queries the whole
  * corpus funnels through Q reducers regardless of cluster size — the
  * classic single-reducer scale-killer. This aggregate instead keeps a
  * k-element heap per query inside each map task (partial aggregation in
  * ObjectHashAggregate), so the exchange carries at most k pairs per
  * (query, partition) — candidates shrink map-side by |partition|/k, and
  * the final merge is k·partitions per query, not |corpus|.
  *
  * Determinism contract: callers pass FINITE scores already rounded to
  * their comparison grain (the similarity family rounds to 6 dp), and
  * ties break on lower id — the same total order as the window form, so
  * results are bit-identical to it over finite scores. Deliberate
  * divergence outside that contract: NULL and NaN scores are EXCLUDED
  * (a NaN cosine means a zero-norm vector — garbage the window form
  * would have ranked first, since desc ordering puts NaN on top).
  *
  * Output: `array<struct<id:long, score:double, rank:int>>` sorted
  * best-first; explode + rename at the call site.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"TopKAgg requires k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "TopKAgg requires (DOUBLE score, BIGINT id), got " +
          s"${score.dataType.catalogString}, ${id.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sd = s.asInstanceOf[Double]
      // NaN would corrupt the heap invariant (every comparison false);
      // excluded by contract — see the class doc
      if (!sd.isNaN) buffer.add(sd, i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val pairs = buffer.sortedPairs
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = InternalRow(pairs(i)._2, pairs(i)._1, i + 1)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) {
      buf.add(bb.getDouble, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)
}

object TopKAgg {
  /** Column-API entry point: `top_k(score, id, k)` under `groupBy(...)`. */
  def top_k(score: Column, id: Column, k: Int): Column =
    Bridge.toCol(
      TopKAgg(Bridge.toExpr(score), Bridge.toExpr(id), k)
        .toAggregateExpression())
}

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
import org.apache.spark.unsafe.types.UTF8String

/** String-keyed sibling of [[TopKBuffer]]: bounded binary heap of
  * (score, key) with the WORST kept element at the root. Ordering: higher
  * score wins; ties break on lexicographically SMALLER key (UTF8String
  * binary order = UTF-8 code-point order, matching Spark's and DuckDB's
  * default string sort), so results are bit-identical to a
  * `row_number().over(partitionBy(g).orderBy(score.desc, key.asc))`
  * window over finite scores.
  */
final class TopKStrBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val keys = new Array[UTF8String](k)
  var size = 0

  /** true if (s1,k1) ranks strictly worse than (s2,k2). */
  @inline private def worse(s1: Double, k1: UTF8String, s2: Double,
      k2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && k1.compareTo(k2) > 0)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), keys(i), scores(p), keys(p))) {
        val s = scores(i); val d = keys(i)
        scores(i) = scores(p); keys(i) = keys(p)
        scores(p) = s; keys(p) = d
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
      if (l < size && worse(scores(l), keys(l), scores(worst), keys(worst))) worst = l
      if (r < size && worse(scores(r), keys(r), scores(worst), keys(worst))) worst = r
      if (worst == i) return
      val s = scores(i); val d = keys(i)
      scores(i) = scores(worst); keys(i) = keys(worst)
      scores(worst) = s; keys(worst) = d
      i = worst
    }
  }

  def add(score: Double, key: UTF8String): Unit = {
    if (size < k) {
      scores(size) = score; keys(size) = key
      size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), keys(0), score, key)) {
      scores(0) = score; keys(0) = key
      siftDown()
    }
  }

  def merge(other: TopKStrBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.keys(i)); i += 1 }
  }

  /** (score, key) pairs sorted best-first — rank i+1 for element i. */
  def sortedPairs: Array[(Double, UTF8String)] = {
    val out = new Array[(Double, UTF8String)](size)
    var i = 0
    while (i < size) { out(i) = (scores(i), keys(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: (Double, UTF8String), b: (Double, UTF8String)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
    out
  }
}

/** Map-side bounded top-k over STRING keys — the scale-safe replacement
  * for per-group `row_number` ranking where the ranked entity is a term /
  * token / category rather than a numeric id (see [[TopKAgg]] for the
  * BIGINT-id variant and the full scale rationale).
  *
  * Motivating shape: per-source topic labeling
  * ([[graft.ext.Retrieval.groupTopTerms]]) ranks each source's ENTIRE
  * distinct-term vocabulary — on web-scale text a dominant source's
  * vocabulary is 10⁸+ rows, and a ranking window funnels all of it
  * through one task's sort. This aggregate keeps ≤k (score, term) pairs
  * per (group, partition) map-side in ObjectHashAggregate partials, so
  * the exchange carries k·partitions rows per group, never the
  * vocabulary.
  *
  * Determinism contract mirrors [[TopKAgg]]: finite scores rounded to the
  * caller's comparison grain; ties break on the lexicographically smaller
  * key (binary UTF-8 order — identical to the `ORDER BY score DESC,
  * key ASC` window and to DuckDB's default collation); NULL/NaN scores
  * and NULL keys are excluded.
  *
  * Output: `array<struct<key:string, score:double, rank:int>>` sorted
  * best-first; explode + rename at the call site.
  */
case class TopKStrAgg(
    score: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] with BinaryLike[Expression] {

  require(k > 0, s"TopKStrAgg requires k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = key

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, key.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "TopKStrAgg requires (DOUBLE score, STRING key), got " +
          s"${score.dataType.catalogString}, ${key.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buffer: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = key.eval(input)
    if (s != null && i != null) {
      val sd = s.asInstanceOf[Double]
      // NaN would corrupt the heap invariant (every comparison false);
      // excluded by contract — see the class doc. The stored key is
      // cloned: eval may return a pointer into a reused row buffer.
      if (!sd.isNaN) buffer.add(sd, i.asInstanceOf[UTF8String].clone())
    }
    buffer
  }

  override def merge(buffer: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TopKStrBuffer): Any = {
    val pairs = buffer.sortedPairs
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = InternalRow(pairs(i)._2, pairs(i)._1, i + 1)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKStrBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buffer.size) { bytes += buffer.keys(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(4 + 12 * buffer.size + bytes)
    bb.putInt(buffer.size)
    i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      val kb = buffer.keys(i).getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.add(s, UTF8String.fromBytes(kb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStrAgg =
    copy(score = newLeft, key = newRight)
}

object TopKStrAgg {
  /** Column-API entry point: `top_k_str(score, key, k)` under `groupBy`. */
  def top_k_str(score: Column, key: Column, k: Int): Column =
    Bridge.toCol(
      TopKStrAgg(Bridge.toExpr(score), Bridge.toExpr(key), k)
        .toAggregateExpression())
}

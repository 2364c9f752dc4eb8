package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.{expressions, plans}
import plans.{logical => logical}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{
  BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.Bridge

/** Native as-of join — the full custom-operator stack (logical node →
  * planner strategy → physical exec) for the one relational operator
  * stock Spark lacks outright: for each left row, the single right row
  * with the same key and the greatest `rightTime <= leftTime`.
  *
  * [[graft.ops.AsofJoin]] is the composed rewrite (union → one window);
  * this is the whole-operator expression of the same semantics, planned
  * like a sort-merge join:
  *
  *  - `requiredChildDistribution` = hash-clustered on the keys for BOTH
  *    children, so `EnsureRequirements` inserts (or reuses!) compatible
  *    Exchanges — a child already partitioned by the key joins with NO
  *    new shuffle, which the union rewrite can never do;
  *  - `requiredChildOrdering` = (keys, time) ascending per side, so
  *    Spark's own `SortExec` (codegen'd, spillable) does the ordering;
  *  - `doExecute` is a per-partition two-pointer merge: O(n+m) per
  *    partition, ZERO buffering beyond the single retained "most recent
  *    right row" — no per-key candidate blow-up at any skew.
  *
  * Semantics (pandas `merge_asof` direction='backward', inclusive;
  * DuckDB `ASOF LEFT JOIN`): every left row survives; right value
  * columns are NULL where no right row precedes. NULL join keys and
  * NULL timestamps never match (SQL join semantics — the sorted-merge
  * would otherwise treat NULL as a real smallest value). Ties on
  * `rightTime` pick the last right row in (keys, time) sort order,
  * which is engine-dependent for duplicate (key, time) right rows —
  * same caveat as DuckDB: pre-aggregate the right side to unique
  * (keys, time) for determinism.
  *
  * 100 TB shape: identical to a sort-merge join of the two inputs —
  * one Exchange per side (none if bucketed/pre-partitioned), one sort
  * per side, streaming merge. The right side is never broadcast and
  * never collected; skewed keys cost one task's linear scan, not a
  * quadratic window.
  */
case class AsofJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] as [[AsofJoinExec]]. Injected by
  * [[graft.GraftExtensions]] (`spark.sql.extensions`) and idempotently
  * added to `spark.experimental.extraStrategies` by
  * [[AsofJoinNative.join]] for already-built sessions. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, fwd, tol) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv,
        fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join. See [[AsofJoinNode]] for semantics
  * and the scale contract.
  *
  * `forward = true` flips the direction: the match is the EARLIEST right
  * row with `rightTime >= leftTime` (pandas direction='forward'); ties
  * on duplicate right (keys, time) then pick the first in sort order.
  * `tolerance` (in the time column's internal units — MICROSECONDS for
  * TIMESTAMP, days for DATE, the raw value for integers) bounds the
  * match window: |rightTime - leftTime| must be <= tolerance or the row
  * gets NULLs. Both knobs leave the merge O(n+m) — direction only
  * changes which side of the pointer the match is read from, tolerance
  * is an emit-time bound check. */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(a => SortOrder(a, Ascending)),
    (rightKeys :+ rightTime).map(a => SortOrder(a, Ascending)))

  // left rows pass through in their sorted order, so both the left
  // child's partitioning and its (keys, time) ordering survive — a
  // downstream groupBy(keys) or another as-of on the same keys reuses
  // them with no new Exchange/Sort.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outAttrs = output
    val fwd = forward
    val tol = tolerance
    val timeType = leftTime.dataType

    val lRdd = left.execute()
    val rRdd = right.execute()
    // zipPartitions silently mis-pairs nothing — it throws on unequal
    // counts — but surface the co-partitioning contract with an
    // operator-level message instead of an RDD internals error
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"asof join children not co-partitioned: ${lRdd.getNumPartitions} " +
        s"vs ${rRdd.getNumPartitions} partitions (EnsureRequirements " +
        "should have aligned these)")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val rValProj = UnsafeProjection.create(rVals, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // bind right values at their WIDENED nullability: a non-nullable
      // right column is still NULL on no-match rows, and a projection
      // bound non-nullable would read the raw slot (0) instead
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rVals.map(_.withNullability(true)))
      val nullVals = new GenericInternalRow(rVals.length)
      val joined = new JoinedRow
      // tolerance needs time arithmetic, not just ordering: extract the
      // underlying numeric (micros for TIMESTAMP, days for DATE)
      val timeGet: InternalRow => Long = timeType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType =>
          (r: InternalRow) => r.getInt(0).toLong
        case _ => (r: InternalRow) => r.getLong(0)
      }

      new Iterator[InternalRow] {
        // lookahead right row, split into its three projections. The
        // key/time/value rows are COPIED on advance: sort iterators
        // reuse row buffers, and the retained "most recent match" must
        // outlive the page it was read from.
        private var rKey: UnsafeRow = _
        private var rTimeRow: UnsafeRow = _
        private var rValRow: UnsafeRow = _
        private var rExhausted = false
        // last right row whose key matched some left key, time <= its
        // left time. Guarded by key equality on read: left keys only
        // ascend, so a stale match from an earlier key can never
        // compare equal again.
        private var matchKey: UnsafeRow = _
        private var matchVals: UnsafeRow = _
        private var matchTime: Long = 0L

        advanceRight()

        // skip right rows with NULL keys or NULL time: they sort first
        // (nulls-first ascending) but must never match
        @annotation.tailrec
        private def advanceRight(): Unit = {
          if (!rIter.hasNext) { rExhausted = true; rKey = null }
          else {
            val r = rIter.next()
            val k = rKeyProj(r)
            if (k.anyNull || rTimeProj(r).isNullAt(0)) advanceRight()
            else {
              rKey = k.copy()
              rTimeRow = rTimeProj(r).copy()
              rValRow = rValProj(r).copy()
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          numOutputRows += 1
          if (lKey.anyNull || lTimeRow.isNullAt(0))
            return outProj(joined(l, nullVals))
          val rv = if (fwd) {
            // consume right rows that can never match this or any later
            // left row (left times only ascend within the key)
            while (!rExhausted && (keyOrd.compare(rKey, lKey) < 0 ||
                (keyOrd.compare(rKey, lKey) == 0 &&
                  timeOrd.compare(rTimeRow, lTimeRow) < 0)))
              advanceRight()
            // rHead is now the earliest right row with time >= left's
            if (!rExhausted && keyOrd.compare(rKey, lKey) == 0 &&
                tol.forall(t =>
                  timeGet(rTimeRow) - timeGet(lTimeRow) <= t))
              rValRow
            else nullVals
          } else {
            while (!rExhausted && keyOrd.compare(rKey, lKey) < 0)
              advanceRight()
            while (!rExhausted && keyOrd.compare(rKey, lKey) == 0 &&
                timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
              matchKey = rKey
              matchVals = rValRow
              matchTime = timeGet(rTimeRow)
              advanceRight()
            }
            if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0 &&
                tol.forall(t => timeGet(lTimeRow) - matchTime <= t))
              matchVals
            else nullVals
          }
          outProj(joined(l, rv))
        }
      }
    }
  }
}

/** DataFrame-level API over [[AsofJoinNode]]. Mirrors
  * [[graft.ops.AsofJoin]]'s contract exactly (same arguments, same
  * output schema, same tie/NULL rules), so the two implementations are
  * interchangeable — and spec-checked against each other. */
object AsofJoinNative {

  /** Idempotently make the planner aware of [[AsofJoinNode]] on a live
    * session (the `spark.sql.extensions=graft.GraftExtensions` path
    * does this at session build instead). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsofJoinStrategy
  }

  /** `left` keeps all its columns; `right`'s non-key, non-ts columns
    * are appended (NULL where no right row precedes/follows). Right
    * value column names must not collide with left's — rename first.
    *
    * `forward = true` matches the earliest right row at-or-after the
    * left time instead of the latest at-or-before. `tolerance` bounds
    * |rightTime - leftTime| in the time column's INTERNAL units:
    * microseconds for TIMESTAMP, days for DATE, the raw value for
    * integer columns. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      forward: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty,
      "asof join: at least one equi key required (a keyless as-of would " +
        "need a single global time order — sort and window instead)")
    require(tolerance.forall(_ >= 0), "asof join: tolerance must be >= 0")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join hygiene: when both sides derive from the same scan they
    // share attribute exprIds, and the analyzer's DeduplicateRelations
    // would re-id the right child underneath our already-resolved key
    // references. Give the right side fresh exprIds up front instead.
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else logical.Project(
        rPlan0.output.map(a =>
          expressions.Alias(a, a.name)(qualifier = a.qualifier)), rPlan0)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asof join: no column '$n' on the $side side " +
          s"(have ${out.map(_.name).mkString(", ")})"))
    val lk = keys.map(attr(lPlan.output, _, "left"))
    val rk = keys.map(attr(rPlan.output, _, "right"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"asof join: key '${a.name}' type mismatch: " +
          s"${a.dataType} vs ${b.dataType}")
    }
    val lt = attr(lPlan.output, leftTs, "left")
    val rt = attr(rPlan.output, rightTs, "right")
    require(lt.dataType == rt.dataType,
      s"asof join: time type mismatch: ${lt.dataType} vs ${rt.dataType}")
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      require(Seq(IntegerType, LongType, DateType, TimestampType,
          TimestampNTZType).contains(lt.dataType),
        s"asof join: tolerance unsupported for time type ${lt.dataType}")
    }
    val rv = rPlan.output.filterNot(a =>
      keys.contains(a.name) || a.name == rightTs)
    val collide = rv.map(_.name).toSet intersect
      lPlan.output.map(_.name).toSet
    require(collide.isEmpty,
      s"right value columns collide with left: $collide")
    Bridge.ofRows(spark,
      AsofJoinNode(lPlan, rPlan, lk, rk, lt, rt, rv, forward, tolerance))
  }
}

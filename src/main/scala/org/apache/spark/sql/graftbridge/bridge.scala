package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the documented escape hatch for libraries registering custom Catalyst
  * expressions without going through the string-SQL function registry.
  * Lives under `org.apache.spark.sql` purely for access; no Spark
  * internals are modified. */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toCol(e: Expression): Column = ExpressionUtils.column(e)

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * library needs to hand Catalyst a custom [[LogicalPlan]] node (e.g.
    * [[graft.plans.AsofJoinNode]]) that the DataFrame DSL cannot spell. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** True when the session's CacheManager holds no cached plans — the
    * leak probe behind the registry-wide persist-hygiene lint. */
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[CSparkSession].sharedState.cacheManager.isEmpty

  /** Drop every cached plan (test hygiene between lint iterations). */
  def clearCache(spark: SparkSession): Unit =
    spark.asInstanceOf[CSparkSession].sharedState.cacheManager.clearCache()

  /** Unpersist the materialized RDD a `localCheckpoint()`-ed frame
    * pins (its plan is a [[org.apache.spark.sql.execution.LogicalRDD]]
    * holding the checkpointed RDD). `Dataset.unpersist` goes through
    * the CacheManager and is a NO-OP on checkpoint storage — without
    * this, release is GC-driven only (ContextCleaner). Frames whose
    * plan is not a bare LogicalRDD are left untouched (false). */
  def unpersistCheckpoint(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); true
      case _ => false
    }

  /** Re-root a `localCheckpoint()`-ed frame at its materialized RDD with
    * DEFAULT planning statistics but the checkpoint's actual
    * outputPartitioning/outputOrdering kept (r15 opt). The stats reset is
    * the [[graft.ops.PlanStats]] contract (checkpoint-inherited
    * sizeInBytes squares per round in self-referencing loops); the old
    * reset path — `createDataFrame(df.rdd, df.schema)` — additionally
    * (a) DISCARDED the partitioning metadata, forcing every loop to
    * re-exchange frames that are already laid out on the join key, and
    * (b) round-tripped rows through the external Row encoder on every
    * consumption. Rebuilding the LogicalRDD directly keeps the
    * InternalRow RDD and the layout, drops only the inherited stats
    * (originStats = None → session default). Partitioning metadata is
    * descriptive, not behavioral: values are unchanged. Falls back to
    * the Row round-trip for frames whose plan is not a bare LogicalRDD. */
  def freshStatsKeepLayout(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(df.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming)(
            df.sparkSession.asInstanceOf[CSparkSession], None, None))
      case _ =>
        df.sparkSession.createDataFrame(df.rdd, df.schema)
    }

  /** Invalidate the session's shared file-status cache — required
    * after a maintenance pass deletes data files OUTSIDE a Spark
    * command (the ArchiveIndex compaction GC): a later read or
    * partitioned append would otherwise re-list the deleted paths from
    * the stale cache (a warn-and-skip, harmless but noisy and a wasted
    * driver-side listing round). `catalog.refreshByPath` is the wrong
    * tool for this — it eagerly RECACHES every cached plan touching
    * the path, re-listing the dead file index it holds. */
  def invalidateFileStatusCache(spark: SparkSession): Unit =
    org.apache.spark.sql.execution.datasources.FileStatusCache
      .getOrCreate(spark.asInstanceOf[CSparkSession]).invalidateAll()
}

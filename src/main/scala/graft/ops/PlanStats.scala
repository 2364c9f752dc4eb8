package graft.ops

import org.apache.spark.sql.DataFrame

/** Planning-statistics hygiene for iterative DataFrame loops.
  *
  * Spark 4's `localCheckpoint` REWRITES the child plan's statistics
  * onto the new LogicalRDD (ExistingRDD.rewriteStatsAndConstraints).
  * An iterative loop that then references the checkpoint MORE THAN
  * ONCE per round (a self-join, or feeding both sides of a pair join)
  * multiplies those stats into the next round's plan, so `sizeInBytes`
  * SQUARES (or cubes) every iteration: after R rounds the stat is a
  * BigInt with ~2^R digits and every further stats visit costs minutes
  * of `BigInteger.multiplyToomCook3` inside
  * SizeInBytesOnlyStatsPlanVisitor before any task runs — the driver
  * "hangs" planning, with zero tasks submitted. (PageRank-shape loops
  * — checkpoint ⋈ fixed-stats cached frame — only grow digits
  * linearly per round and never need this.)
  *
  * [[freshStats]] re-wraps the checkpointed RDD via `createDataFrame`,
  * dropping the inherited stats back to the session default so every
  * round's planning stays O(1). Row conversion costs O(rows) per
  * round — the same order as the round's own join — and content is
  * untouched. Apply it to EVERY per-round checkpoint of a loop whose
  * next plan references that checkpoint 2+ times (the
  * connectedComponents lesson, TextDedup.scala; since r13 VERDICT #4
  * also Bradley-Terry, label propagation, and k-core — the reset
  * makes deep `iters` a safe public knob instead of a documented
  * footgun). */
object PlanStats {

  /** Reset `df`'s planning statistics to the session default by
    * re-rooting at its checkpointed RDD — content-identical, lineage
    * stays truncated (pair with an eager `localCheckpoint`). Since r15
    * the rewrap KEEPS the checkpoint's outputPartitioning/ordering and
    * the InternalRow RDD (no external-Row round trip): loops whose
    * next round joins or aggregates on the key the checkpoint is
    * already laid out on skip that exchange entirely. */
  def freshStats(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.freshStatsKeepLayout(df)
}

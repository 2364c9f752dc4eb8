package graft.ops

import java.util.ArrayDeque

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Deterministic lifetime for mid-pipeline caches.
  *
  * Operators that must materialize statistics before building their final
  * plan (e.g. [[Transform]]'s fused stats pass) persist their input so the
  * caller's action does not recompute the upstream lineage. But a bare
  * `persist` with no matching `unpersist` leaks storage: invoked per
  * micro-batch (StreamPipeline) or per bench rep, cached blocks accumulate
  * until GC-driven cleanup happens to run — unbounded memory/disk growth
  * under sustained load, and eviction thrash under storage pressure.
  *
  * This registry makes release explicit: operators register through
  * [[persist]], and every driver-side consumer calls [[releaseAll]] once
  * its materializing action (write/collect) completes. Contract: release
  * AFTER the action — the returned plans reference the cached data
  * lazily.
  *
  * The registry is THREAD-LOCAL: plan construction and the matching
  * release happen on the same driver thread in every consumer (a
  * foreachBatch body runs whole on its stream's microbatch thread), and
  * scoping per thread means one stream's release cannot unpersist a
  * concurrent stream's still-needed caches.
  */
object CacheScope {

  private val active =
    ThreadLocal.withInitial[ArrayDeque[DataFrame]](() => new ArrayDeque())

  /** Persist `df` (memory-then-disk) and register it for the next
    * [[releaseAll]]. If an identical plan is already cached (e.g. a caller
    * pre-cached the input), the frame is neither re-persisted nor
    * registered — ownership stays with whoever cached it first. */
  def persist(df: DataFrame): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      active.get.add(df)
    }
    df
  }

  /** Register an ALREADY-persisted frame for the next [[releaseAll]] —
    * for operators that manage persistence themselves mid-computation
    * (e.g. iterative algorithms) but want their final cached result
    * scope-released like everything else. */
  def track(df: DataFrame): DataFrame = {
    active.get.add(df)
    df
  }

  /** Register a `localCheckpoint()`-ed frame for DETERMINISTIC block
    * release at the next [[releaseAll]]/[[releaseSince]]. A checkpoint
    * pins its materialized RDD outside the CacheManager, so a plain
    * `unpersist` is a no-op on it and cleanup is otherwise GC-driven
    * only (ContextCleaner, whenever the LogicalRDD happens to be
    * collected) — invoked per bench rep or per registry-lint pass,
    * those pinned RDDs accumulate exactly like the leaked stage caches
    * [[releaseSince]] exists to prevent. Release unwraps the frame's
    * LogicalRDD and unpersists the checkpointed RDD itself. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    active.get.add(df)
    df
  }

  /** Position marker for [[releaseSince]]: the number of frames this
    * thread has registered so far. */
  def mark(): Int = active.get.size

  /** Unpersist ONLY the frames this thread registered after `mark` —
    * the scoped release for operators that pin their outputs
    * (localCheckpoint) mid-body and then REWRITE the storage their
    * internal stages were read from (the ArchiveIndex commit loop):
    * the stage caches are both a per-micro-batch storage leak and, in
    * the session-wide CacheManager, live holders of dead file indexes
    * that a post-GC recache would re-list. Caller-registered frames
    * (below the mark) keep their caller-owned lifetime. */
  def releaseSince(mark: Int): Unit = {
    val q = active.get
    while (q.size > mark) free(q.pollLast())
  }

  /** Unpersist every frame registered ON THIS THREAD. Idempotent;
    * non-blocking (block deletion proceeds asynchronously, correctness
    * never depends on it). */
  def releaseAll(): Unit = {
    val q = active.get
    var df = q.poll()
    while (df != null) {
      free(df)
      df = q.poll()
    }
  }

  /** CacheManager unpersist for cached frames; checkpoint-RDD
    * unpersist for [[trackCheckpoint]]-registered frames (a bare
    * LogicalRDD plan — the unwrap is a no-op on everything else, so
    * one release path serves both registrations). */
  private def free(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    org.apache.spark.sql.graftbridge.Bridge.unpersistCheckpoint(df)
    ()
  }
}

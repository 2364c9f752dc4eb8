package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are concatenated in id
  * order and chunked into fixed context windows, so each doc needs its
  * global token offset — an exclusive prefix sum over the corpus.
  *
  * The naive form (`sum().over(Window.orderBy(id))`) funnels every row
  * through ONE reducer. This implements the classic two-phase
  * distributed prefix sum instead:
  *
  *   1. range-partition by id and sort within partitions — each
  *      partition owns a contiguous id range;
  *   2. per-partition totals (tiny: one row per partition) get their own
  *      running offsets on a single task — the only sequential step,
  *      O(#partitions), corpus-size-independent;
  *   3. offsets broadcast back; the intra-partition running sum uses a
  *      window PARTITIONED BY partition id, so every partition computes
  *      its local prefix in parallel.
  *
  * Result is independent of the partition count (range boundaries come
  * from sampling, but the prefix sum over a fixed id order does not
  * depend on where the cuts fall — the spec proves repartition
  * invariance).
  */
object Packing {

  /** Global packing offsets: (idCol, n_tokens, global_offset, chunk_id,
    * offset_in_chunk) with chunks of `chunkTokens` tokens over the
    * id-ordered concatenation of the corpus. */
  def packOffsets(docs: DataFrame, idCol: String, lenCol: String,
      chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    // persisted, not merely shared lineage: both consumers below re-derive
    // __pid from the range exchange, and without materialization their
    // consistency would silently depend on exchange reuse (a second
    // materialization of RangePartitioner can sample different
    // boundaries). The cache pins one set of partition boundaries.
    val sorted = graft.ops.CacheScope.persist(
      docs.select(col(idCol), col(lenCol).cast("long").as("n_tokens"))
        .repartitionByRange(col(idCol))
        .sortWithinPartitions(col(idCol))
        .withColumn("__pid", spark_partition_id()))
    val partOffsets = sorted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptotal"))
      .withColumn("__poffset",
        coalesce(
          sum(col("__ptotal")).over(
            Window.orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__poffset"))
    val localW = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(partOffsets), Seq("__pid"))
      .withColumn("global_offset",
        col("__poffset") + coalesce(sum(col("n_tokens")).over(localW), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("global_offset"))
      // integer `div`, not `/`: epoch-scale offsets must not round-trip
      // through double
      .withColumn("chunk_id", expr(s"global_offset div $chunkTokens"))
      .withColumn("offset_in_chunk", col("global_offset") % chunkTokens)
  }

  /** Length-balanced bin packing (the sample-packing shape: fill training
    * context windows with whole documents so padding waste stays low).
    * The bin count is fixed up front at `ceil(total_tokens / ctxTokens)`
    * — the minimum possible — and docs are dealt to bins longest-first in
    * serpentine (boustrophedon) order: rank docs by tokens descending,
    * round r hands one doc to each bin, alternating bin order left-to-
    * right / right-to-left between rounds so a bin that got the largest
    * doc of one round gets the smallest of the next. One deterministic
    * pass, no sequential bin state — unlike first-fit-decreasing, whose
    * "current fill" dependency serializes the whole corpus.
    *
    * Scale (100 TB): the global longest-first rank is the SAME two-phase
    * distributed prefix shape as [[packOffsets]] (range-partition on the
    * sort key, per-partition counts — one tiny row each — prefix-summed
    * and broadcast back, local ranks in parallel); bin count comes from a
    * 1-row aggregate broadcast. Nothing funnels through one reducer.
    *
    * Determinism: rank order (n_tokens desc, id) is total, all
    * arithmetic integral — bit-stable across layouts and engines (the
    * spec proves repartition invariance).
    *
    * Output: (idCol, n_tokens, bin_id). */
  def binPack(docs: DataFrame, idCol: String, lenCol: String,
      ctxTokens: Int): DataFrame = {
    require(ctxTokens > 0, "ctxTokens must be positive")
    val toks = docs.select(col(idCol), col(lenCol).cast("long").as("n_tokens"))
    // cache pins one set of range boundaries — see packOffsets' note
    val sorted = graft.ops.CacheScope.persist(
      toks.repartitionByRange(col("n_tokens").desc, col(idCol))
        .sortWithinPartitions(col("n_tokens").desc, col(idCol))
        .withColumn("__pid", spark_partition_id()))
    val partOffsets = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pcnt"))
      .withColumn("__poffset",
        coalesce(
          sum(col("__pcnt")).over(
            Window.orderBy("__pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__poffset"))
    val nBins = toks.agg(
      greatest(lit(1L),
        expr(s"(coalesce(sum(n_tokens), 0) + $ctxTokens - 1) div $ctxTokens"))
        .as("__nbins"))
    val localW = Window.partitionBy("__pid")
      .orderBy(col("n_tokens").desc, col(idCol))
    sorted.join(broadcast(partOffsets), Seq("__pid"))
      .withColumn("__rn", col("__poffset") + row_number().over(localW) - 1)
      .crossJoin(broadcast(nBins))
      .withColumn("bin_id",
        when(expr("__rn div __nbins") % 2 === 0,
          col("__rn") % col("__nbins"))
          .otherwise(col("__nbins") - 1 - col("__rn") % col("__nbins")))
      .select(col(idCol), col("n_tokens"), col("bin_id"))
  }

  /** Sliding-window document chunking (the RAG / long-context training
    * prep shape): token windows of `chunkTokens` advancing by `stride`,
    * final window allowed partial, every doc yields ≥ 1 chunk. Output:
    * (idCol, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).
    *
    * One codegen projection + one explode — no shuffle, no state; chunk
    * COUNT arithmetic stays integral end-to-end (no ceil-on-double). */
  def chunkDocs(docs: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val t: Column = TextStats.tokens(col(textCol))
    docs.select(col(idCol), t.as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(transform(sequence(lit(0),
          when(size(col("__tk")) <= chunkTokens, lit(1)).otherwise(expr(
            s"(size(__tk) - $chunkTokens + $stride - 1) div $stride + 1")
            .cast("int")) - 1),
          k => k * stride + 1)))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col").as("chunk_start"),
        least(lit(chunkTokens), size(col("__tk")) - col("col") + 1)
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__tk"), col("col"), lit(chunkTokens)))
          .as("chunk_text"))
  }
}

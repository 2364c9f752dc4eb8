package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.CacheScope

/** Iterative link-graph operators. Corpus-curation use: web-crawl
  * pipelines rank domains/pages by link authority (PageRank / harmonic
  * centrality) to prioritize crawling and weight sources — the graph
  * analogue of the quality gates in [[TextStats]].
  */
object Graph {

  /** PageRank with uniform teleport and dangling-mass redistribution.
    *
    * `nodes` is one `node` column (the universe; isolated nodes get the
    * teleport mass), `edges` is (`src`, `dst`) — rows outside the node
    * universe should be pre-filtered by the caller. T iterations of
    *
    *   r'(v) = (1−d)/N + d · (Σ_{(u,v)∈E} r(u)/outdeg(u) + D/N)
    *
    * where D = Σ r(u) over dangling (outdeg-0) nodes.
    *
    * Scale shape: the edge list (with outdeg attached) is persisted once
    * and reused every iteration; each iteration is ONE equi-join of the
    * rank vector with the edge list on `src` plus one hash aggregate on
    * `dst` — no windows, no driver-side collection (the dangling mass
    * rides a 1-row broadcast cross join). Each iteration's rank frame is
    * `localCheckpoint`ed: the loop body references `ranks` three times
    * (dangling, inflow, recurrence), so WITHOUT lineage truncation the
    * Catalyst plan tree triples per iteration — exponential analysis
    * cost that OOMs the driver near 10 iterations regardless of data
    * size. Persist alone does not help (caching stores blocks but keeps
    * the full logical plan). On a real cluster swap `localCheckpoint`
    * for reliable `checkpoint` (HDFS/object-store dir) so executor loss
    * cannot drop a truncated partition; the edge list would additionally
    * be bucketed by `src` ([[graft.sinks.Sinks.writeBucketed]]) making
    * the per-iteration join exchange-free on the edge side.
    *
    * Determinism (oracle parity): per-edge contributions r(u)/outdeg(u)
    * are IEEE double ops on bit-identical inputs; their per-node sum and
    * the dangling sum go through exact DECIMAL(38,18) so aggregation
    * order cannot drift; the recurrence is evaluated with one fixed
    * expression shape. Every iteration is then bit-identical across
    * engines and layouts.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    // the rank universe size: one count over the (small) node frame; a
    // production run would pass it in from the graph-prep manifest
    val n = nodes.select(col("node")).distinct().count()
    val nD = n.toDouble
    val tele = (1 - damping) / nD

    val nodeF = CacheScope.persist(nodes.select(col("node")).distinct())
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edgeF = CacheScope.persist(
      edges.select(col("src"), col("dst")).join(outdeg, "src"))

    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 18))).cast("double")

    var ranks =
      nodeF.select(col("node"), lit(1.0 / nD).as("rank")).localCheckpoint()
    for (_ <- 1 to iters) {
      // dangling mass: rank held by nodes with no outgoing edges
      val dang = ranks
        .join(outdeg, ranks("node") === outdeg("src"), "left_anti")
        .agg(coalesce(decSum(col("rank")), lit(0.0)).as("dang"))
      val inflow = ranks
        .join(edgeF, ranks("node") === edgeF("src"))
        .groupBy(col("dst").as("node"))
        .agg(decSum(col("rank") / col("outdeg")).as("inflow"))
      val next = nodeF
        .join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(tele) + lit(damping) *
            (coalesce(col("inflow"), lit(0.0)) + col("dang") / lit(nD)))
            .as("rank"))
      // eager checkpoint materializes `next` BEFORE the old blocks go
      // away; only then is dropping the previous iteration's rank frame
      // safe (its truncated lineage cannot be recomputed)
      val promoted = next.localCheckpoint()
      ranks.unpersist(blocking = false)
      ranks = promoted
    }
    CacheScope.track(ranks)
  }
}

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

  /** HITS (Kleinberg hubs & authorities) with L1 normalization.
    *
    * T iterations of the mutual recurrence over edges (src → dst):
    *
    *   a'(v) = Σ_{(u,v)∈E} h(u)   then a ← a / Σ a
    *   h'(u) = Σ_{(u,v)∈E} a(v)   then h ← h / Σ h
    *
    * Nodes outside the edge set keep score 0 (they neither point nor are
    * pointed at); the node frame fixes the output universe. L1 (not the
    * textbook L2) normalization is deliberate: the normalizer is then a
    * plain sum of non-negative doubles, which goes through the exact
    * DECIMAL path — no per-iteration sqrt whose rounding would have to be
    * pinned on both engines. Ranking order is identical under any
    * p-norm (positive scalar rescale).
    *
    * Scale shape: identical to [[pageRank]] — the persisted edge list is
    * reused every iteration; one equi-join + one hash aggregate per
    * half-step, normalizers ride a 1-row broadcast, per-iteration
    * `localCheckpoint` truncates the (here mutually recursive, so
    * doubly exploding) lineage. Swap for reliable `checkpoint` + an
    * edge list bucketed on BOTH src and dst copies on a real cluster.
    */
  def hits(nodes: DataFrame, edges: DataFrame, iters: Int = 4)
      : DataFrame = {
    require(iters >= 1, "hits: iters must be >= 1")
    val nodeF = CacheScope.persist(nodes.select(col("node")).distinct())
    val edgeF = CacheScope.persist(edges.select(col("src"), col("dst")))

    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 18))).cast("double")
    // L1-normalize `valueCol` over the whole frame via a 1-row broadcast;
    // the all-zero guard keeps the expression shape identical to the
    // oracle's CASE (double 0/0 would be NaN, not an ANSI error)
    def l1norm(df: DataFrame, valueCol: String): DataFrame = {
      val tot = df.agg(coalesce(decSum(col(valueCol)), lit(0.0)).as("tot"))
      df.crossJoin(broadcast(tot))
        .select(col("node"),
          when(col("tot") =!= 0.0, col(valueCol) / col("tot"))
            .otherwise(lit(0.0)).as(valueCol))
    }

    var hubs =
      nodeF.select(col("node"), lit(1.0).as("hub")).localCheckpoint()
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val authRaw = hubs
        .join(edgeF, hubs("node") === edgeF("src"))
        .groupBy(col("dst").as("node"))
        .agg(decSum(col("hub")).as("auth"))
      val nextAuth = l1norm(
        nodeF.join(authRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("auth"), lit(0.0)).as("auth")),
        "auth").localCheckpoint()
      if (auths != null) auths.unpersist(blocking = false)
      auths = nextAuth
      val hubRaw = auths
        .join(edgeF, auths("node") === edgeF("dst"))
        .groupBy(col("src").as("node"))
        .agg(decSum(col("auth")).as("hub"))
      val nextHub = l1norm(
        nodeF.join(hubRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("hub"), lit(0.0)).as("hub")),
        "hub").localCheckpoint()
      hubs.unpersist(blocking = false)
      hubs = nextHub
    }
    CacheScope.track(
      hubs.join(auths, Seq("node"))
        .select(col("node"), col("hub"), col("auth")))
  }
}

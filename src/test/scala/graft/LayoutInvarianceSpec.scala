package graft

import org.apache.spark.sql.functions.col

/** Partition-count invariance for the LAYOUT-SENSITIVE operators — the
  * ones whose implementations read `spark_partition_id`, draw range
  * boundaries, or fold across partitions (two-phase prefix sums,
  * range-keyed curriculum, deterministic sampling, iterative fits).
  * Their scaladocs claim the output is a pure function of the DATA, not
  * of how Spark happened to lay it out; this spec executes each under
  * two coprime shuffle-partition counts with AQE coalescing disabled
  * (so the counts are real) and requires bit-identical sorted output.
  * A failure here is exactly the bug class the two-phase designs exist
  * to prevent: results that change when the cluster size does.
  */
class LayoutInvarianceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] = {
    val df = Registry.queries(name)(spark, sf)
    val out = df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      .collect().map(_.mkString("|")).sorted.toSeq
    graft.ops.CacheScope.releaseAll()
    out
  }

  test("layout-sensitive operators are invariant to the shuffle " +
      "partition count") {
    val names = Seq(
      "q_abc_pareto",            // spark_partition_id two-phase prefix sum
      "ext_pack_offsets",        // the packing prefix sum
      "ext_token_budget_select", // range-partitioned quality budget
      "ext_curriculum_order",    // percentile cuts + per-cell window
      "ext_det_sample",          // md5-coin deterministic sampling
      "ext_stratified_sample",   // exact-size allocation + per-stratum pick
      "ext_bradley_terry",       // iterative MM with decimal sums
      "ext_negative_sampling_table", // cumulative ranges via prefix sum
      "ext_graph_triangles",     // degree-ordered orientation + explode
      "ext_label_propagation",   // iterative argmax relabeling
      "ext_kcore",               // iterative batched peeling
      "ext_bm25_prf_topk")       // two-round bounded-heap feedback loop
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    val origAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      names.foreach { n =>
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val a = rows(n)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        val b = rows(n)
        assert(a.nonEmpty, s"$n returned no rows at sf0.001")
        assert(a == b,
          s"$n output depends on the shuffle partition count (7 vs 29)")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", origParts)
      spark.conf.set("spark.sql.adaptive.enabled", origAqe)
    }
  }
}

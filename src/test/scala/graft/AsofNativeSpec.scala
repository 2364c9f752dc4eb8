package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoinNative

/** The native (LogicalPlan + Strategy + SparkPlan) as-of join: result
  * parity with the composed rewrite, its own NULL semantics, and the
  * physical-plan contract (exec present, sort-merge shape, partitioning
  * reuse downstream). */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic mixed workload: keys 0..6, left-only key 100,
  // right-only key 200, in-partition duplicates, tie timestamps
  private lazy val leftDf = ((1 to 200).map(i =>
    (i % 7, (i * 37) % 97, s"L$i")) ++ Seq((100, 50, "Lonly")))
    .toDF("k", "t", "lv")
  private lazy val rightDf = ((1 to 80).map(i =>
    (i % 7, (i * 13) % 89, i * 10)) ++ Seq((200, 1, -1)))
    .groupBy(x => (x._1, x._2)).map(_._2.head) // unique (k, t): determinism
    .toSeq.sorted
    .toDF("k", "t", "rv")

  test("native asof ≡ composed asof on a mixed workload") {
    val l = leftDf
    val r = rightDf.withColumnRenamed("t", "rt")
    val native = AsofJoinNative.join(l, r, Seq("k"), "t", "rt")
      .select("k", "t", "lv", "rv")
    val composed = graft.ops.AsofJoin(l, r, Seq("k"), "t", "rt")
      .select("k", "t", "lv", "rv")
    val n = native.collect().map(_.toSeq).sortBy(_.toString)
    val c = composed.collect().map(_.toSeq).sortBy(_.toString)
    assert(n.length == 201 && n.toSeq == c.toSeq)
  }

  test("inclusive tie: a right row at exactly the left time matches") {
    val l = Seq((1, 10, "a")).toDF("k", "t", "lv")
    val r = Seq((1, 10, "hit"), (1, 9, "miss")).toDF("k", "rt", "rv")
    val out = AsofJoinNative.join(l, r, Seq("k"), "t", "rt").collect()
    assert(out.length == 1 && out(0).getString(3) == "hit")
  }

  test("NULL keys and NULL times never match (either side)") {
    val l = Seq((Some(1), Some(10), "ok"), (None, Some(10), "nullkey"),
      (Some(1), None, "nulltime")).toDF("k", "t", "lv")
    val r = Seq((Some(1), Some(5), "m"), (None, Some(1), "rnullkey"),
      (Some(1), None, "rnulltime")).toDF("k", "rt", "rv")
    val out = AsofJoinNative.join(l, r, Seq("k"), "t", "rt")
      .collect().map(x => (x.getString(2), x.getString(3))).toMap
    // only the fully-non-null left row matches, and only the
    // fully-non-null right row can be its match
    assert(out == Map("ok" -> "m", "nullkey" -> null, "nulltime" -> null))
  }

  test("composed AsofJoin: NULL keys and NULL times never match — same " +
      "contract as the native form and DuckDB ASOF") {
    val l = Seq((Some(1), Some(10), "ok"), (None, Some(10), "nullkey"),
      (Some(1), None, "nulltime")).toDF("k", "t", "lv")
    val r = Seq((Some(1), Some(5), "m"), (None, Some(1), "rnullkey"),
      (Some(1), None, "rnulltime")).toDF("k", "rt", "rv")
    val out = graft.ops.AsofJoin(l, r, Seq("k"), "t", "rt")
      .collect().map(x => (x.getAs[String]("lv"), x.getAs[String]("rv")))
      .toMap
    // pre-fix, the union-window rewrite grouped NULL keys together and
    // carried the NULL-ts right row (NULLS FIRST) as a bogus match
    assert(out == Map("ok" -> "m", "nullkey" -> null, "nulltime" -> null))
  }

  test("plan: AsofJoinExec, sort-merge shape, exactly one Exchange per side") {
    val df = AsofJoinNative.join(
      leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"), "t", "rt")
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("AsofJoin"), s)
    assert("(?i)sort".r.findAllIn(s).length >= 2, s)
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 2, s)
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoop"), s)
  }

  test("plan: output partitioning is reused — groupBy(keys) after asof adds no Exchange") {
    val joined = AsofJoinNative.join(
      leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"), "t", "rt")
    val agg = joined.groupBy("k").agg(sum("rv").as("s"))
    val s = agg.queryExecution.executedPlan.toString
    // two input shuffles only; the aggregation rides the asof's
    // hash partitioning
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 2, s)
  }

  test("forward direction: earliest right row at-or-after, inclusive") {
    val l = Seq((1, 10, "a"), (1, 21, "b"), (2, 5, "c")).toDF("k", "t", "lv")
    val r = Seq((1, 9, "old"), (1, 10, "now"), (1, 20, "next"), (1, 30, "far"))
      .toDF("k", "rt", "rv")
    val out = AsofJoinNative.join(l, r, Seq("k"), "t", "rt", forward = true)
      .collect().map(x => (x.getString(2), x.getString(3))).toMap
    // a: rt=10 (inclusive tie); b: rt=30 (20 already passed); c: none
    assert(out == Map("a" -> "now", "b" -> "far", "c" -> null))
  }

  test("tolerance bounds the window in both directions") {
    val l = Seq((1, 100, "x"), (1, 200, "y")).toDF("k", "t", "lv")
    val r = Seq((1, 95, "near"), (1, 120, "after")).toDF("k", "rt", "rv")
    val back = AsofJoinNative.join(l, r, Seq("k"), "t", "rt",
        tolerance = Some(10L))
      .collect().map(x => (x.getString(2), x.getString(3))).toMap
    // x: 95 within 5; y: latest at-or-before is 120<=200 at distance 80 > 10
    assert(back == Map("x" -> "near", "y" -> null))
    val fwd = AsofJoinNative.join(l, r, Seq("k"), "t", "rt",
        forward = true, tolerance = Some(25L))
      .collect().map(x => (x.getString(2), x.getString(3))).toMap
    // x: next-at-or-after is 120, distance 20 <= 25; y: nothing after
    assert(fwd == Map("x" -> "after", "y" -> null))
  }

  test("forward ≡ reversed backward on the mixed workload (negated time)") {
    val l = leftDf
    val r = rightDf.withColumnRenamed("t", "rt")
    val fwd = AsofJoinNative.join(l, r, Seq("k"), "t", "rt", forward = true)
      .select("k", "t", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val revBack = AsofJoinNative.join(
        l.withColumn("t", -col("t")), r.withColumn("rt", -col("rt")),
        Seq("k"), "t", "rt")
      .select(col("k"), (-col("t")).as("t"), col("lv"), col("rv"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(fwd.toSeq == revBack.toSeq)
  }

  test("chained as-ofs shuffle the accumulating left exactly once") {
    val df = AnalyticsQueries.qAsofPit.run(spark, "/root/testdata/sf0.001")
    val s = df.queryExecution.executedPlan.toString
    assert("AsofJoin".r.findAllIn(s).length == 3, s)
    // 1 left + 3 right-side exchanges; NOT 6 (each chained as-of reuses
    // the previous exec's output partitioning and ordering)
    assert("Exchange hashpartitioning".r.findAllIn(s).length == 4, s)
  }

  test("pre-partitioned children with mismatched counts are re-aligned") {
    val l = leftDf.repartition(7, col("k"))
    val r = rightDf.withColumnRenamed("t", "rt").repartition(3, col("k"))
    val out = AsofJoinNative.join(l, r, Seq("k"), "t", "rt")
      .select("k", "t", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    val ref = AsofJoinNative.join(
        leftDf, rightDf.withColumnRenamed("t", "rt"), Seq("k"), "t", "rt")
      .select("k", "t", "lv", "rv")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(out.toSeq == ref.toSeq)
  }

  test("streaming: foreachBatch stream-static enrichment through the native exec") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("asofstream")
    val in = dir.resolve("in").toString
    val ckpt = dir.resolve("ckpt").toString
    val left = Seq((1, 10, "a"), (1, 21, "b"), (2, 5, "c")).toDF("k", "t", "lv")
    left.write.parquet(in)
    val dim = Seq((1, 9, "r9"), (1, 20, "r20")).toDF("k", "rt", "rv")
    val got = collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = spark.readStream.schema(left.schema).parquet(in)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= AsofJoinNative.join(batch, dim, Seq("k"), "t", "rt")
            .collect().map(r => (r.getString(2), r.getString(3)))
        }
        ()
      }.start()
    q.awaitTermination(120000)
    // per-micro-batch results equal the batch as-of on the same rows
    assert(got.sorted.toSeq ==
      Seq(("a", "r9"), ("b", "r20"), ("c", null)).sorted)
  }

  test("left rows with no right partner (and empty right partitions) get NULLs") {
    val l = Seq((1, 10, "a"), (2, 5, "b")).toDF("k", "t", "lv")
    val r = Seq((1, 20, "late")).toDF("k", "rt", "rv") // only AFTER left times
    val out = AsofJoinNative.join(l, r, Seq("k"), "t", "rt")
      .collect().map(x => (x.getString(2), x.getString(3))).toMap
    assert(out == Map("a" -> null, "b" -> null))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the retail-analytics queries (RetailQueries) at
  * sf0.001 — invariants the DuckDB hash gate can't articulate: score
  * ranges, conservation laws, monotonicity, and a from-first-principles
  * OLS replay for the elasticity regression.
  */
class RetailSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q_churn_kaplan_meier: proper survival curve over the customer " +
      "base") {
    import spark.implicits._
    val rows = AnalyticsQueries.qKaplanMeier.run(spark, sf)
      .orderBy(col("life"))
      .select(col("life"), col("d"), col("c"), col("n_at_risk"),
        col("survival"))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // the first risk set is the whole ordering customer base
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.head._4 == nCust, "initial risk set = all customers")
    // risk sets telescope: n(t+1) = n(t) - d(t) - c(t)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 == a._4 - a._2 - a._3,
          s"risk set must telescope at life=${b._1}")
      case _ =>
    }
    // survival is a proper non-increasing curve in [0, 1], and only
    // churn events (d > 0) may move it
    rows.foldLeft(1.0) { case (prev, (life, d, _, _, s)) =>
      assert(s >= 0.0 && s <= prev + 1e-9,
        s"survival must be non-increasing in [0,1] at life=$life")
      if (d == 0)
        assert(math.abs(s - prev) < 1e-9,
          s"censoring alone must not move survival at life=$life")
      s
    }
    // the data has both churned and censored customers — the estimator
    // is exercised on both branches
    assert(rows.map(_._2).sum > 0 && rows.map(_._3).sum > 0)
  }

  test("q_demand_lag_features: lags shift observed weeks, ma4 averages " +
      "the trailing frame") {
    import spark.implicits._
    val rows = RetailQueries.qDemandLag.run(spark, sf)
      .select(col("l_partkey"), col("week"), col("qty"), col("lag1"),
        col("lag4"), col("ma4"))
      .as[(Long, String, Double, Option[Double], Option[Double], Double)]
      .collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { series =>
      series.zipWithIndex.foreach { case ((_, _, _, lag1, lag4, ma4), i) =>
        // lag over OBSERVED weeks: row i sees row i−1 / i−4 or NULL
        assert(lag1 == (if (i >= 1) Some(series(i - 1)._3) else None))
        assert(lag4 == (if (i >= 4) Some(series(i - 4)._3) else None))
        val frame = series.slice(math.max(0, i - 3), i + 1).map(_._3)
        assert(math.abs(ma4 - frame.sum / frame.size) < 1e-6,
          s"ma4 must average the trailing frame at index $i")
      }
    }
  }

  test("q_abc_xyz: full part coverage, shares sum to 1, classes valid") {
    val out = RetailQueries.qAbcXyz.run(spark, sf).collect()
    graft.ops.CacheScope.releaseAll()
    val nParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(out.map(_.getAs[Long]("n_parts")).sum == nParts)
    assert(math.abs(out.map(_.getAs[Double]("rev_share")).sum - 1.0)
      < 1e-4)
    assert(out.forall(r => Set("A", "B", "C")(r.getAs[String]("abc_class"))
      && Set("X", "Y", "Z")(r.getAs[String]("xyz_class"))))
  }

  test("q_rfm_segments: scores in 1..4, quartile monotonicity, coverage") {
    val out = RetailQueries.qRfm.run(spark, sf).cache()
    try {
      val nCust = Tables.orders(spark, sf)
        .select(col("o_custkey")).distinct().count()
      assert(out.count() == nCust, "one row per ordering customer")
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val bad = out.filter(col(c) < 1 || col(c) > 4).count()
        assert(bad == 0, s"$c outside 1..4")
      }
      // monotonicity: a strictly larger f can never score LOWER
      val viol = out.as("a").join(out.as("b"),
          col("a.f") > col("b.f") && col("a.f_score") < col("b.f_score"))
        .count()
      assert(viol == 0, "f_score must be monotone in f")
      // segment label is total (no nulls) and from the closed set
      val segs = out.select(col("segment")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(segs.subsetOf(
        Set("champion", "at_risk", "new_or_light", "regular")))
    } finally { out.unpersist(); () }
  }

  test("q_abc_pareto: cumulative share monotone to 1.0, classes ordered") {
    val out = RetailQueries.qAbcPareto.run(spark, sf).cache()
    try {
      val rows = out.orderBy(col("revenue").desc, col("l_partkey"))
        .collect()
      assert(rows.nonEmpty)
      var prev = 0.0
      rows.foreach { r =>
        val share = r.getAs[Double]("cum_share")
        assert(share >= prev - 1e-9, "cum_share must be nondecreasing")
        prev = share
      }
      assert(math.abs(prev - 1.0) < 1e-6, s"final share $prev != 1.0")
      // class boundaries: every A-row share <= every B-row share, etc.
      val maxA = rows.filter(_.getAs[String]("abc_class") == "A")
        .map(_.getAs[Double]("cum_share")).maxOption.getOrElse(0.0)
      val minB = rows.filter(_.getAs[String]("abc_class") == "B")
        .map(_.getAs[Double]("cum_share")).minOption.getOrElse(1.0)
      val maxB = rows.filter(_.getAs[String]("abc_class") == "B")
        .map(_.getAs[Double]("cum_share")).maxOption.getOrElse(0.0)
      assert(maxA <= 0.80 + 1e-9 && minB > 0.80 - 1e-9 && maxB <= 0.95 + 1e-9)
      // conservation: class revenues sum to the corpus total
      val total = rows.map(_.getAs[Double]("revenue")).sum
      val liTotal = Tables.lineitem(spark, sf)
        .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")),
          6)).head().getDouble(0)
      assert(math.abs(total - liTotal) / liTotal < 1e-9)
    } finally { out.unpersist(); () }
  }

  test("q_price_elasticity: matches a from-first-principles OLS replay") {
    val out = RetailQueries.qElasticity.run(spark, sf)
      .collect().map(r => r.getAs[String]("p_type") -> r).toMap
    // independent replay: collect (x, y) per type (test-only scale) and
    // run the textbook formula in Scala on the same 6-dp-rounded logs
    val li = Tables.lineitem(spark, sf).filter(col("l_quantity") > 0)
    val pt = Tables.part(spark, sf).filter(col("p_retailprice") > 0)
    val xy = li.join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        round(log(col("p_retailprice")), 6).as("x"),
        round(log(col("l_quantity")), 6).as("y"))
      .collect()
      .groupBy(_.getString(0))
    xy.foreach { case (ptype, rows) =>
      val xs = rows.map(_.getAs[Double]("x"))
      val ys = rows.map(_.getAs[Double]("y"))
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val got = out(ptype).getAs[Double]("elasticity")
      assert(math.abs(got - slope) < 1e-4,
        s"$ptype: engine slope $got vs replay $slope")
      val r2 = out(ptype).getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"$ptype r2 $r2 out of [0,1]")
    }
    assert(out.size == xy.size, "one row per part type")
  }

  test("q_order_count_distribution: conserves customers and orders") {
    val out = RetailQueries.qOrderCountDist.run(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(out.map(_.getAs[Long]("custdist")).sum == nCust,
      "distribution must cover every customer exactly once")
    assert(out.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist"))
      .sum == nOrd, "count-weighted sum must equal total joined orders")
  }

  test("q_returned_items: top-20 descending, R-flag revenue only") {
    val rows = RetailQueries.qReturnedItems.run(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
      "must be ordered by revenue descending")
    assert(revs.forall(_ > 0))
  }

  test("q_large_volume_customers: every order exceeds the threshold, " +
      "and the set matches an independent recount") {
    val out = RetailQueries.qLargeVolume.run(spark, sf).collect()
    assert(out.forall(_.getAs[Double]("sum_qty") > 250.0))
    val expect = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(Det.dsum(col("l_quantity")).as("s"))
      .filter(col("s") > 250.0).count()
    assert(out.length.toLong == expect,
      s"${out.length} rows vs $expect qualifying orders")
  }

  test("q_market_share: shares interior and components consistent") {
    val rows = RetailQueries.qMarketShare.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = r.getAs[Double]("nation_revenue")
      val tot = r.getAs[Double]("total_revenue")
      val share = r.getAs[Double]("mkt_share")
      assert(nat >= 0 && nat <= tot)
      assert(math.abs(share - math.rint(nat / tot * 1e6) / 1e6) < 1e-9)
      val y = r.getAs[Int]("o_year")
      assert(y >= 1995 && y <= 2001)
    }
  }

  test("q_yoy_brand_growth: prev matches the prior year's revenue") {
    val rows = RetailQueries.qYoyBrandGrowth.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKey = rows.map(r => (r.getAs[String]("p_brand"),
      r.getAs[Int]("yr")) -> r).toMap
    rows.foreach { r =>
      val growth = r.getAs[Double]("yoy_growth")
      val rev = r.getAs[Double]("revenue")
      val prev = r.getAs[Double]("prev_revenue")
      assert(math.abs(growth -
        math.rint((rev - prev) / prev * 1e6) / 1e6) < 1e-9)
      // if the prior year is also in the output, its revenue must equal
      // this row's prev (chain consistency)
      byKey.get((r.getAs[String]("p_brand"), r.getAs[Int]("yr") - 1))
        .foreach(p => assert(p.getAs[Double]("revenue") == prev))
    }
  }

  test("q_repeat_purchase_interval: intervals = orders - 1 per customer") {
    val out = RetailQueries.qRepeatInterval.run(spark, sf)
      .collect().map(r => r.getAs[Long]("o_custkey") -> r).toMap
    val perCust = Tables.orders(spark, sf)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perCust.foreach { case (ck, n) =>
      if (n >= 2) {
        val r = out.getOrElse(ck, fail(s"customer $ck missing"))
        assert(r.getAs[Long]("n_intervals") == n - 1)
        assert(r.getAs[Double]("avg_gap_days") >= 0.0)
        assert(r.getAs[Long]("max_gap_days") >=
          r.getAs[Double]("avg_gap_days").floor.toLong)
      } else assert(!out.contains(ck), s"single-order customer $ck present")
    }
  }

  test("q_session_conversion: conserves the q_sessions_gap session count") {
    val out = RetailQueries.qSessionConversion.run(spark, sf).collect()
    val totalSessions = graft.streaming.SessionWindows
      .sessions(Tables.events(spark, sf), "4 hours").count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum == totalSessions,
      "daily session counts must sum to the corpus session count")
    out.foreach { r =>
      val n = r.getAs[Long]("n_sessions")
      val c = r.getAs[Long]("n_converting")
      assert(c >= 0 && c <= n)
      assert(math.abs(r.getAs[Double]("conversion_rate") -
        math.rint(c.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
  }

  test("q_ref_integrity: clean keys report zero, real defects surface") {
    val out = RetailQueries.qRefIntegrity.run(spark, sf)
      .collect().map(r => r.getAs[String]("check") ->
        r.getAs[Long]("violations")).toMap
    assert(out.size == 5)
    // the synthetic star schema is referentially clean on the fk chains
    assert(out("lineitem_orphan_orders") == 0)
    assert(out("orders_orphan_customers") == 0)
    assert(out("orders_dup_orderkey") == 0)
    assert(out("customer_dup_custkey") == 0)
    // ...but the generator reuses linenumbers within an order — a REAL
    // defect the audit must surface, not mask
    assert(out("lineitem_dup_pk") > 0)
  }

  test("q_nation_trade_volume: no domestic flows, conserves cross-border " +
      "revenue") {
    val rows = RetailQueries.qNationTrade.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation")))
    val years = rows.map(_.getAs[Int]("l_year"))
    assert(years.min >= 1995 && years.max <= 2005)
  }

  test("q_promo_revenue_share: share consistent with its components") {
    val r = RetailQueries.qPromoShare.run(spark, sf).head()
    val promo = r.getAs[Double]("promo_revenue")
    val total = r.getAs[Double]("total_revenue")
    val share = r.getAs[Double]("promo_share_pct")
    assert(promo >= 0 && promo <= total)
    assert(math.abs(share - 100.0 * promo / total) < 1e-6)
    assert(share > 0 && share < 100,
      "testdata has PROMO and non-PROMO parts, share must be interior")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantics specs for the AnalyticsQueries2 operators — a constructed
  * growth-accounting fixture that exercises every user class (the
  * testdata's 15 users are active every week, so resurrection/churn
  * never fire there), Benford identities plus a conforming log-uniform
  * sample, and a manual recompute of the forecast-backtest metrics.
  */
class Analytics2Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("growthAccounting: constructed fixture hits every class and " +
      "the accounting identities hold") {
    // Weeks (Mondays): w1=2024-01-01, w2=01-08, w3=01-15.
    // user 1: w1 w2 w3  -> retained twice
    // user 2: w1 __ w3  -> resurrected in w3, churn attributed to w2
    // user 3: w1 __ __  -> churn attributed to w2
    // user 4: __ w2 w3  -> new in w2, retained in w3
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (1L, "2024-01-16 10:00:00"),
      (2L, "2024-01-03 11:00:00"), (2L, "2024-01-17 11:00:00"),
      (3L, "2024-01-04 12:00:00"),
      (4L, "2024-01-10 13:00:00"), (4L, "2024-01-18 13:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val out = AnalyticsQueries2.growthAccounting(ev)
      .orderBy("week")
      .select("week", "new_users", "retained_users", "resurrected_users",
        "active_users", "churned_users")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.toSeq == Seq(
      ("2024-01-01", 3L, 0L, 0L, 3L, 0L),
      ("2024-01-08", 1L, 1L, 0L, 2L, 2L),
      ("2024-01-15", 0L, 2L, 1L, 3L, 0L)))
    // identities: active = new + retained + resurrected;
    // retained(w) = active(w-1) - churned(w)
    out.foreach { case (_, nw, re, rs, ac, _) => assert(ac == nw + re + rs) }
    out.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._5 - b._6)
      case _ =>
    }
  }

  test("q_growth_accounting: identities hold on testdata") {
    val rows = AnalyticsQueries2.qGrowthAccounting.run(spark, sf)
      .orderBy("week")
      .select("week", "new_users", "retained_users", "resurrected_users",
        "active_users", "churned_users")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nw, re, rs, ac, _) => assert(ac == nw + re + rs) }
    // the first reported week is all-new by definition
    assert(rows.head._2 == rows.head._5 && rows.head._6 == 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._5 - b._6,
        s"retained(${b._1}) must equal active(prev) - churned")
      case _ =>
    }
  }

  test("q_benford_first_digit: digit spine, identities, and the " +
      "near-uniform totals correctly fail conformance") {
    val rows = AnalyticsQueries2.qBenford.run(spark, sf)
      .orderBy("digit")
      .select("digit", "observed", "observed_frac", "expected_frac",
        "chi2_term", "chi_square")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(rows.map(_._1).toSeq == (1 to 9).map(_.toString))
    val n = Tables.orders(spark, sf).filter(col("o_totalprice") > 0).count()
    assert(rows.map(_._2).sum == n, "observed counts partition the orders")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9,
      "Benford expected fracs sum to 1")
    // chi_square is the sum of the per-digit terms (one value, repeated)
    assert(rows.map(_._6).distinct.length == 1)
    assert(math.abs(rows.map(_._5).sum - rows.head._6) < 1e-3)
    // near-uniform synthetic totals are NOT Benford: chi2 >> 15.51
    // (the 0.05 critical value at df=8)
    assert(rows.head._6 > 15.51)
    // each term recomputes from its own row
    rows.foreach { case (_, obs, _, p, term, _) =>
      val exp = n * p
      assert(math.abs((obs - exp) * (obs - exp) / exp - term) < 1e-3)
    }
  }

  test("q_basket_triples: supports recompute from the collected baskets") {
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val manual = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(3).map(_.toVector))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
    val out = AnalyticsQueries2.qBasketTriples.run(spark, sf)
      .select("p1", "p2", "p3", "support")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => Vector(r._1, r._2, r._3) -> r._4).toMap
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    assert(out == manual, "triples and supports must match the manual " +
      "per-basket combination count")
    out.keys.foreach(t => assert(t(0) < t(1) && t(1) < t(2)))
  }

  test("basketTriplesApriori: output-identical to the direct plan on " +
      "testdata AND on a fixture where the L2 prune actually fires") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("p1", "p2", "p3", "support", "support_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val direct = rows(AnalyticsQueries2.basketTriples(
      Tables.lineitem(spark, sf)))
    graft.ops.CacheScope.releaseAll()
    val apriori = rows(AnalyticsQueries2.basketTriplesApriori(
      Tables.lineitem(spark, sf)))
    graft.ops.CacheScope.releaseAll()
    assert(direct.nonEmpty && apriori == direct)
    // fixture: triple (10,20,30) support 2; parts 40/50 form only
    // support-1 pairs, so L2 prunes them before the 3-way join
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 40L),
      (2L, 10L), (2L, 20L), (2L, 30L), (2L, 50L))
      .toDF("l_orderkey", "l_partkey")
    val fx = rows(AnalyticsQueries2.basketTriplesApriori(li))
    graft.ops.CacheScope.releaseAll()
    assert(fx == Set((10L, 20L, 30L, 2L, 1.0)))
  }

  test("maxBasket contract: an over-cap basket is excluded from triples, " +
      "pair lift, supports, and the triples normalizer") {
    // orders 1-3: sane 3-item baskets; order 99: a 6-item bot basket
    // that a cap of 5 must exclude from every surface
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L), (3L, 40L),
      (99L, 10L), (99L, 20L), (99L, 30L), (99L, 40L), (99L, 50L),
      (99L, 60L))
      .toDF("l_orderkey", "l_partkey")
    val tri = AnalyticsQueries2.basketTriples(li, maxBasket = 5L)
      .select("p1", "p2", "p3", "support", "support_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    // only (10,20,30) from the two identical sane baskets; the bot
    // basket neither adds support nor inflates the normalizer (n=3)
    assert(tri.toSeq == Seq((10L, 20L, 30L, 2L,
      math.rint(2.0 / 3.0 * 1e9) / 1e9)))
    val orders = (1L to 4L).toDF("o_orderkey")
    val lift = AnalyticsQueries.basketPairLift(li, orders, maxBasket = 5L)
      .select("part_a", "part_b", "n_pair", "lift")
      .as[(Long, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    // (10,20) co-occurs in all 3 sane baskets (the bot basket would
    // have pushed (10,30)/(20,30) over the >=3 floor); supports are
    // post-cap (10 and 20 in 3 baskets each), n_orders stays 4
    assert(lift.toSeq == Seq((10L, 20L, 3L,
      math.rint(3.0 * 4 / (3.0 * 3) * 1e6) / 1e6)))
    // the uncapped run DOES see the bot basket — the cap is the only
    // thing excluding it
    val triUncapped = AnalyticsQueries2.basketTriples(li)
      .select("p1").as[Long].collect()
    graft.ops.CacheScope.releaseAll()
    assert(triUncapped.length > 1, "sanity: default cap admits order 99")
  }

  test("SCD2: no-op changes open no version, intervals chain, one " +
      "current row per user") {
    val ev = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "view"),
      (1L, 11L, "2024-01-01 11:00:00", "view"),    // no-op duplicate
      (1L, 12L, "2024-01-01 12:00:00", "cart"),
      (1L, 13L, "2024-01-01 13:00:00", "view"),    // back -> new version
      (2L, 20L, "2024-01-02 09:00:00", "signup"))
      .toDF("user_id", "event_id", "s", "event_type")
      .select(col("user_id"), col("event_id"),
        col("s").cast("timestamp").as("ts"), col("event_type"))
    val rows = AnalyticsQueries2.scd2(ev)
      .orderBy("user_id", "valid_from")
      .as[(Long, String, String, Option[String], Int)].collect()
    assert(rows.toSeq == Seq(
      (1L, "view", "2024-01-01 10:00:00", Some("2024-01-01 12:00:00"), 0),
      (1L, "cart", "2024-01-01 12:00:00", Some("2024-01-01 13:00:00"), 0),
      (1L, "view", "2024-01-01 13:00:00", None, 1),
      (2L, "signup", "2024-01-02 09:00:00", None, 1)))
  }

  test("q_scd2_user_segments: intervals chain and exactly one current " +
      "version per user on testdata") {
    val rows = AnalyticsQueries2.qScd2.run(spark, sf)
      .select("user_id", "segment", "valid_from", "valid_to", "is_current")
      .as[(Long, String, String, Option[String], Int)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, vs) =>
      assert(vs.count(_._5 == 1) == 1, s"user $u must have ONE current")
      val sorted = vs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3),
            s"user $u: version must close at the next valid_from")
          assert(a._2 != b._2, s"user $u: consecutive versions differ")
        case _ =>
      }
      assert(sorted.last._4.isEmpty)
    }
  }

  test("q_sales_rollup_region: subtotals telescope across levels") {
    val rows = AnalyticsQueries2.qRollup.run(spark, sf)
      .select("r_name", "n_name", "lvl", "n_orders", "revenue")
      .as[(Option[String], Option[String], Int, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    val leaves = rows.filter(_._3 == 0)
    val regions = rows.filter(_._3 == 1)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1)
    assert(leaves.nonEmpty && regions.nonEmpty)
    assert(leaves.map(_._4).sum == grand.head._4)
    assert(regions.map(_._4).sum == grand.head._4)
    regions.foreach { case (r, _, _, n, rev) =>
      val ls = leaves.filter(_._1 == r)
      assert(ls.map(_._4).sum == n, s"region $r order counts roll up")
      assert(math.abs(ls.map(_._5).sum - rev) < 0.02,
        s"region $r revenue rolls up")
    }
  }

  test("q_open_orders_daily: concurrency telescopes and closes to zero") {
    val rows = AnalyticsQueries2.qOpenOrdersDaily.run(spark, sf)
      .orderBy("day")
      .select("day", "opened", "closed", "open_count")
      .as[(String, Long, Long, Long)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val nIv = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf).select(col("l_orderkey")).distinct(),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(rows.map(_._2).sum == nIv, "every interval opens once")
    assert(rows.map(_._3).sum == nIv, "every interval closes once")
    rows.foldLeft(0L) { case (prev, (day, o, c, open)) =>
      assert(open == prev + o - c, s"open_count must telescope at $day")
      assert(open >= 0, s"concurrency cannot go negative at $day")
      open
    }
    assert(rows.last._4 == 0L, "all orders eventually close")
  }

  test("q_top_journey_paths: paths recompute from per-user event " +
      "prefixes") {
    val manual = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2)).take(5).map(_._4)
        .mkString(">"))
      .toMap.values.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = AnalyticsQueries2.qJourneyPaths.run(spark, sf)
      .select("path", "n_users", "n_converting", "conversion_rate")
      .as[(String, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    assert(out.map(r => r._1 -> r._2).toMap == manual)
    out.foreach { case (path, n, conv, rate) =>
      assert(conv == (if (path.contains("purchase")) n else 0L),
        "conversion counts whole paths, not users within a path")
      assert(math.abs(rate - conv.toDouble / n) < 1e-9)
      assert(path.split(">").length <= 5)
    }
    // every user lands in exactly one path
    val nUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.map(_._2).sum == nUsers)
  }

  test("q_customer_value_migration: matrix accounts for every active " +
      "customer exactly once") {
    val out = AnalyticsQueries2.qValueMigration.run(spark, sf)
      .select("q_h1", "q_h2", "n_customers")
      .as[(Int, Int, Long)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    out.foreach { case (a, b, n) =>
      assert(a >= 0 && a <= 4 && b >= 0 && b <= 4 && n > 0)
      assert(!(a == 0 && b == 0), "inactive-in-both never appears")
    }
    // the matrix partitions the customers with >= 1 order
    val active = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(out.map(_._3).sum == active)
    // both movement directions exist in the testdata (the matrix is
    // not diagonal) and churn/new edges are populated
    assert(out.exists(r => r._1 == 0 && r._2 > 0), "new customers")
    assert(out.exists(r => r._1 > 0 && r._2 > 0 && r._1 != r._2),
      "cross-quartile movement")
  }

  test("q_cohort_ltv_curve: curves telescope and account for all " +
      "revenue") {
    val out = AnalyticsQueries2.qCohortLtv.run(spark, sf)
      .select("cohort", "age", "n_customers", "revenue", "cum_revenue",
        "ltv_per_customer")
      .as[(String, Int, Long, Double, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    out.foreach { case (cohort, curve) =>
      assert(curve.head._2 == 0,
        s"cohort $cohort starts at age 0 (its own first-order month)")
      curve.foldLeft(0.0) { case (prev, (_, _, n, rev, cum, ltv)) =>
        assert(math.abs(cum - (prev + rev)) < 1e-6,
          s"cum_revenue must telescope in cohort $cohort")
        assert(math.abs(ltv - cum / n) < 1e-4)
        cum
      }
      assert(curve.map(_._3).distinct.length == 1,
        "cohort size is constant along its curve")
    }
    val total = Tables.orders(spark, sf)
      .agg(Det.dsum(col("o_totalprice"))).as[Double].collect().head
    val sumRev = out.values.flatten.map(_._4).sum
    assert(math.abs(sumRev - total) < 1e-2,
      "the curves partition every order's revenue")
  }

  test("q_return_rate_by_lag: rates recompute, impossible lags excluded") {
    val out = AnalyticsQueries2.qReturnByLag.run(spark, sf)
      .select("lag_weeks", "n_items", "n_returned", "return_rate")
      .as[(Long, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    out.foreach { case (w, n, r, rate) =>
      assert(w >= 0, "ship-before-order rows are excluded")
      assert(r <= n)
      assert(math.abs(rate - r.toDouble / n) < 1e-6)
    }
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("l_shipdate")) >= to_date(col("o_orderdate")))
      .count()
    assert(out.map(_._2).sum == expected,
      "buckets partition every physically-possible line item")
  }

  test("q_forecast_backtest: metrics recompute from the weekly series") {
    val weekly = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"),
        to_date(date_trunc("week", col("l_shipdate"))).as("wk"))
      .agg(round(sum(col("l_quantity")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double"), 2).as("qty"))
      .orderBy("l_partkey", "wk")
      .select("l_partkey", "qty").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    val out = AnalyticsQueries2.qForecastBacktest.run(spark, sf)
      .select("l_partkey", "n_eval", "mae_naive", "mae_ma4",
        "rmse_naive", "rmse_ma4")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.nonEmpty)
    val byPart = out.map(r => r._1 -> r).toMap
    // coverage: exactly the parts with >= 5 observed weeks appear
    assert(byPart.keySet == weekly.filter(_._2.length >= 5).keySet)
    out.foreach { case (pk, nEval, maeN, maeM, rmseN, rmseM) =>
      val series = weekly(pk)
      assert(nEval == series.length - 4)
      val evals = (4 until series.length).map { i =>
        val a = series(i)
        val naive = series(i - 1)
        val ma4 = BigDecimal(series.slice(i - 4, i).sum / 4)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (math.abs(a - naive), math.abs(a - ma4),
          (a - naive) * (a - naive), (a - ma4) * (a - ma4))
      }
      assert(math.abs(maeN - evals.map(_._1).sum / nEval) < 1e-4)
      assert(math.abs(maeM - evals.map(_._2).sum / nEval) < 1e-4)
      assert(math.abs(rmseN - math.sqrt(evals.map(_._3).sum / nEval)) < 1e-4)
      assert(math.abs(rmseM - math.sqrt(evals.map(_._4).sum / nEval)) < 1e-4)
    }
  }
}

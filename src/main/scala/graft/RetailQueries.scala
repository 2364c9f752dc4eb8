package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Det._

/** Retail / customer-analytics queries over the star schema — the
  * segmentation, concentration, and elasticity measures an e-commerce
  * warehouse (the reference's domain: README.md:9-31) computes daily, none
  * of which the reference's two Lambda scripts attempt (SURVEY.md §2.4 gap).
  *
  * All follow the repo's determinism rules ([[Det]]): money through exact
  * decimal sums, libm outputs 6-dp rounded on BOTH engines, percentile cuts
  * via percentile_disc (a data value — no interpolation arithmetic).
  */
object RetailQueries {

  /** RFM segmentation — the classic customer-value model: per customer,
    * Recency (days since last order, measured from the corpus' own max
    * order date so the query is reproducible), Frequency (order count),
    * Monetary (exact-decimal lifetime spend), each scored 1-4 by quartile
    * and combined into a coarse segment label.
    *
    * Scale shape: one orders-keyed hash aggregate (map-side partial) to
    * the per-customer grain, then TWO one-row broadcasts — the corpus max
    * date and the 9 quartile cuts — joined back with `crossJoin(broadcast)`
    * (the [[AnalyticsQueries.qQuartileAssign]] pattern). Nothing sorts
    * globally; the percentile_disc cuts are the only sort-aggregate and
    * run over the CUSTOMER-grain frame (1000× smaller than orders), which
    * at 100 TB would swap to approx_percentile with the same plan shape
    * (the q_winsorized_stats note). R-score ascends with staleness
    * (1 = most recent), F/M-scores ascend with value (4 = best). */
  val qRfm = Q(
    "q_rfm_segments",
    (s, d) => {
      val o = Tables.orders(s, d)
      // persisted: the customer-grain aggregate feeds THREE consumers
      // (the corpus max date, the quartile cuts, and the final scoring
      // projection) — uncached, the orders fact scan + aggregate would
      // run once per consumer (the paretoCumShare lesson)
      val perCust = graft.ops.CacheScope.persist(
        o.groupBy(col("o_custkey")).agg(
          max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("f"),
          dsum(col("o_totalprice")).as("m")))
      // corpus max date = max over the customer-grain maxes — no second
      // fact-table scan
      val nowRow = perCust.agg(max(col("last_order")).as("now_d"))
      val rfm = perCust.crossJoin(broadcast(nowRow))
        .withColumn("r_days",
          datediff(col("now_d"), col("last_order")).cast("long"))
      // cut strategy per axis: r_days and f are BOUNDED-DISTINCT
      // (horizon days / order counts), so their quartiles stay on the
      // plain percentile_disc aggregate; MONETARY is effectively
      // distinct at 100 TB — a single-task percentile buffer would not
      // hold, so its cuts ride the distributed rank selection
      // (graft.ext.Stats.distDiscPercentiles). Same data values either
      // way; oracle untouched.
      val rfmP = graft.ops.CacheScope.persist(rfm)
      def cut(c: String, p: Double) =
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $c)")
          .cast("double")
      val rfCuts = rfmP.agg(
        cut("r_days", 0.25).as("r1"), cut("r_days", 0.5).as("r2"),
        cut("r_days", 0.75).as("r3"),
        cut("f", 0.25).as("f1"), cut("f", 0.5).as("f2"),
        cut("f", 0.75).as("f3"))
      val mCuts = graft.ext.Stats.distDiscPercentiles(
        rfmP.select(col("m")), "m",
        Seq((1, 4), (2, 4), (3, 4)), Seq("m1", "m2", "m3"))
      val cuts = rfCuts.crossJoin(mCuts)
      def score(v: String, q1: String, q2: String, q3: String) =
        when(col(v) <= col(q1), 1).when(col(v) <= col(q2), 2)
          .when(col(v) <= col(q3), 3).otherwise(4)
      rfmP.crossJoin(broadcast(cuts))
        .withColumn("r_score", score("r_days", "r1", "r2", "r3"))
        .withColumn("f_score", score("f", "f1", "f2", "f3"))
        .withColumn("m_score", score("m", "m1", "m2", "m3"))
        .withColumn("segment",
          when(col("r_score") <= 2 && col("f_score") >= 3
            && col("m_score") >= 3, "champion")
            .when(col("r_score") >= 3 && col("f_score") >= 3, "at_risk")
            .when(col("r_score") <= 2 && col("f_score") <= 2, "new_or_light")
            .otherwise("regular"))
        .select(col("o_custkey"), col("r_days"), col("f"), col("m"),
          col("r_score"), col("f_score"), col("m_score"), col("segment"))
    },
    Some(s"""WITH per_cust AS (
        SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
          count(*) AS f, ${dsumSql("o_totalprice")} AS m
        FROM orders GROUP BY o_custkey),
      now_row AS (SELECT max(CAST(o_orderdate AS DATE)) AS now_d FROM orders),
      rfm AS (
        SELECT o_custkey, CAST(now_d - last_order AS BIGINT) AS r_days, f, m
        FROM per_cust, now_row),
      cuts AS (SELECT
          CAST(quantile_disc(r_days, 0.25) AS DOUBLE) AS r1,
          CAST(quantile_disc(r_days, 0.5) AS DOUBLE) AS r2,
          CAST(quantile_disc(r_days, 0.75) AS DOUBLE) AS r3,
          CAST(quantile_disc(f, 0.25) AS DOUBLE) AS f1,
          CAST(quantile_disc(f, 0.5) AS DOUBLE) AS f2,
          CAST(quantile_disc(f, 0.75) AS DOUBLE) AS f3,
          CAST(quantile_disc(m, 0.25) AS DOUBLE) AS m1,
          CAST(quantile_disc(m, 0.5) AS DOUBLE) AS m2,
          CAST(quantile_disc(m, 0.75) AS DOUBLE) AS m3
        FROM rfm),
      scored AS (
        SELECT o_custkey, r_days, f, m,
          CASE WHEN r_days <= r1 THEN 1 WHEN r_days <= r2 THEN 2
               WHEN r_days <= r3 THEN 3 ELSE 4 END AS r_score,
          CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2
               WHEN f <= f3 THEN 3 ELSE 4 END AS f_score,
          CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2
               WHEN m <= m3 THEN 3 ELSE 4 END AS m_score
        FROM rfm, cuts)
      SELECT o_custkey, r_days, f, m, r_score, f_score, m_score,
        CASE WHEN r_score <= 2 AND f_score >= 3 AND m_score >= 3
               THEN 'champion'
             WHEN r_score >= 3 AND f_score >= 3 THEN 'at_risk'
             WHEN r_score <= 2 AND f_score <= 2 THEN 'new_or_light'
             ELSE 'regular' END AS segment
      FROM scored"""),
    bench = true)

  /** ABC / Pareto concentration analysis: parts ranked by lifetime
    * discounted revenue, classed A while the cumulative share is within
    * 80%, B within 95%, C beyond — the inventory-prioritization 80/20
    * view every retail warehouse maintains.
    *
    * The cumulative share over the revenue-DESC ranking is a global
    * prefix sum — the naive `sum().over(Window.orderBy(...))` funnels
    * every part through ONE reducer. This reuses the two-phase
    * distributed shape from [[graft.ext.Packing.packOffsets]]:
    * range-partition on (revenue DESC, partkey), per-partition totals
    * (one tiny row each) prefix-summed on a single bounded task and
    * broadcast back, intra-partition running sums in parallel. All
    * accumulation in exact DECIMAL (sums of DECIMAL(18,6) widen exactly);
    * the share divides as double only at the very end, identically
    * parenthesized in the oracle, then rounds to 6 dp.
    *
    * The cache pins one set of range boundaries (the packOffsets note:
    * both the totals pass and the final pass re-derive `__pid`, and an
    * exchange re-materialization could re-sample boundaries). */
  /** The distributed cumulative-share core of [[qAbcPareto]], reusable
    * and property-tested (PropertySpec pins it against a sequential fold
    * across random layouts): given a (key, decimal value) frame, returns
    * (key, cum_share) with cum_share = running value share under the
    * (value DESC, key) total order, via the two-phase prefix sum
    * ([[graft.ext.Packing.packOffsets]] shape — see [[qAbcPareto]] for
    * the full rationale). */
  def paretoCumShare(rev: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val sorted = graft.ops.CacheScope.persist(
      rev.repartitionByRange(col(valCol).desc, col(keyCol))
        .sortWithinPartitions(col(valCol).desc, col(keyCol))
        .withColumn("__pid", spark_partition_id()))
    val partOffsets = sorted.groupBy(col("__pid"))
      .agg(sum(col(valCol)).as("__ptot"))
      .withColumn("__poff",
        coalesce(
          sum(col("__ptot")).over(Window.orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 6))))
      .select(col("__pid"), col("__poff"))
    // totals read the CACHED range-partitioned frame, not the input
    // lineage — `rev.agg` would re-run the upstream fact-table scan +
    // aggregate a second time (a full extra corpus pass at 100 TB)
    val tot = sorted.agg(sum(col(valCol)).as("__tot"))
    val localW = Window.partitionBy("__pid")
      .orderBy(col(valCol).desc, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    sorted.join(broadcast(partOffsets), Seq("__pid"))
      .withColumn("__cum", col("__poff") + sum(col(valCol)).over(localW))
      .crossJoin(broadcast(tot))
      .withColumn("cum_share",
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6))
  }

  val qAbcPareto = Q(
    "q_abc_pareto",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6))).as("rev_dec"))
      paretoCumShare(rev, "l_partkey", "rev_dec")
        .select(col("l_partkey"), col("rev_dec").cast("double").as("revenue"),
          col("cum_share"),
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B")
            .otherwise("C").as("abc_class"))
    },
    Some("""WITH rev AS (
        SELECT l_partkey,
          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS rev_dec
        FROM lineitem GROUP BY l_partkey),
      w AS (
        SELECT l_partkey, rev_dec,
          sum(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(rev_dec) OVER () AS tot
        FROM rev)
      SELECT l_partkey, CAST(rev_dec AS DOUBLE) AS revenue,
        round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share,
        CASE WHEN round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) <= 0.80
               THEN 'A'
             WHEN round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) <= 0.95
               THEN 'B'
             ELSE 'C' END AS abc_class
      FROM w"""),
    bench = true)

  /** Log-log price elasticity per product type: OLS of ln(quantity) on
    * ln(retail price) across lineitems — slope ≈ % demand change per
    * % price change, the pricing team's first-order signal. Closed-form
    * regression AS AGGREGATION (the [[AnalyticsQueries.qCorr]] fused-stat
    * shape): every Σx/Σy/Σxy/Σxx/Σyy accumulates in ONE hash aggregate
    * per p_type — one lineitem scan, one shuffle on a 6-key group; no
    * ml.regression iteration, no per-group collect.
    *
    * Determinism: ln() is libm → both engines round the per-row logs to
    * 6 dp BEFORE the products (the Retrieval libm rule); all sums are
    * exact DECIMAL(38,12) (per-row double→decimal rounding is identical);
    * slope/intercept/r² evaluate on the resulting exact doubles with
    * identical parenthesization, then round to 6 dp. The part join keys
    * on l_partkey; part is the smaller dimension and AQE/Catalyst
    * broadcast it below threshold (at 100 TB part shuffles — same plan,
    * bigger exchange). */
  val qElasticity = Q(
    "q_price_elasticity",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .select(col("l_partkey"), col("l_quantity"))
      val pt = Tables.part(s, d)
        .filter(col("p_retailprice") > 0)
        .select(col("p_partkey"), col("p_type"), col("p_retailprice"))
      val xy = li.join(pt, li("l_partkey") === pt("p_partkey"))
        .select(col("p_type"),
          round(log(col("p_retailprice")), 6).as("x"),
          round(log(col("l_quantity")), 6).as("y"))
      val w = xy.groupBy(col("p_type")).agg(
        count(lit(1)).as("n"),
        dsumWide(col("x")).as("sx"),
        dsumWide(col("y")).as("sy"),
        dsumWide(col("x") * col("y")).as("sxy"),
        dsumWide(col("x") * col("x")).as("sxx"),
        dsumWide(col("y") * col("y")).as("syy"))
      w.select(col("p_type"), col("n"),
        Ols.slope(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
          .as("elasticity"),
        Ols.intercept(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"))
          .as("intercept"),
        Ols.r2(col("n"), col("sx"), col("sy"), col("sxy"), col("sxx"),
          col("syy")).as("r2"))
    },
    Some(s"""WITH xy AS (
        SELECT p_type, round(ln(p_retailprice), 6) AS x,
          round(ln(l_quantity), 6) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_quantity > 0 AND p_retailprice > 0),
      w AS (
        SELECT p_type, count(*) AS n,
          ${dsumWideSql("x")} AS sx, ${dsumWideSql("y")} AS sy,
          ${dsumWideSql("x * y")} AS sxy, ${dsumWideSql("x * x")} AS sxx,
          ${dsumWideSql("y * y")} AS syy
        FROM xy GROUP BY p_type)
      SELECT p_type, n,
        ${Ols.slopeSql("n", "sx", "sy", "sxy", "sxx")} AS elasticity,
        ${Ols.interceptSql("n", "sx", "sy", "sxy", "sxx")} AS intercept,
        ${Ols.r2Sql("n", "sx", "sy", "sxy", "sxx", "syy")} AS r2
      FROM w"""))

  /** Customer order-count distribution (the TPC-H Q13 shape): LEFT join
    * so zero-order customers survive with count 0, then a second
    * aggregation to the distribution grain. Two shuffles by necessity
    * (different keys); the first is the only orders-sized one, the second
    * runs over the customer-grain frame. count(o_orderkey) (not
    * count(*)) makes the null-extension rows count as zero. */
  val qOrderCountDist = Q(
    "q_order_count_distribution",
    (s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    Some("""WITH per AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey)
      SELECT c_count, count(*) AS custdist FROM per GROUP BY c_count"""))

  /** Promotion revenue share (the TPC-H Q14 shape): what fraction of a
    * year's discounted revenue came from PROMO-type parts — one
    * conditional aggregate over the part join, the shipdate predicate
    * pushed to the lineitem scan. Both the conditional and total sums
    * ride the SAME hash aggregate (one scan, one 1-row result); the
    * share divides exact decimals as double and rounds 6 dp. */
  val qPromoShare = Q(
    "q_promo_revenue_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01")
          && col("l_shipdate") < lit("1998-01-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val pt = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
      val j = li.join(pt, li("l_partkey") === pt("p_partkey"))
      j.agg(
        dsum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0)), 6).as("promo_revenue"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
            .as("promo_share_pct"))
    },
    Some(s"""WITH w AS (
        SELECT
          ${dsumSql(
            "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END",
            6)} AS promo_revenue,
          ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
      SELECT promo_revenue, total_revenue,
        round(100.0 * promo_revenue / total_revenue, 6) AS promo_share_pct
      FROM w"""))

  /** Returned-item revenue by customer (the TPC-H Q10 shape): which
    * customers drove the most returned revenue in a half-year — the
    * churn-risk report. Four-way join: lineitem (the only big side,
    * R-flag + the orders date predicate pushed below the joins) → orders
    * → customer → nation (broadcast — 25 rows); deterministic top-20 via
    * the (revenue DESC, custkey) total order, compiled to
    * TakeOrderedAndProject (bounded per-partition top-k, driver merge —
    * never a global sort). */
  val qReturnedItems = Q(
    "q_returned_items",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01")
          && col("o_orderdate") < lit("1997-07-01"))
      val cust = Tables.customer(s, d)
      val nat = Tables.nation(s, d)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, n_name,
        ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** Large-volume customers (the TPC-H Q18 shape): orders whose total
    * lineitem quantity exceeds the threshold, with their customers — a
    * HAVING aggregate whose survivors join BACK to the fact tables. The
    * quantity aggregate runs first (orderkey-grain, map-side partials)
    * and only the >250 survivors (≈1% of orders) join onward, so the
    * expensive joins see the filtered frame, not the corpus. */
  val qLargeVolume = Q(
    "q_large_volume_customers",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      big.join(ord, big("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_totalprice"), col("sum_qty"))
    },
    Some(s"""WITH big AS (
        SELECT l_orderkey, ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING ${dsumSql("l_quantity")} > 250.0)
      SELECT c_custkey, c_name, o_orderkey,
        strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        o_totalprice, sum_qty
      FROM big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey"""))

  /** National market share (the TPC-H Q8 shape): per order year, the
    * share of ASIA-customer revenue supplied by NATION_3 suppliers —
    * nation joins BOTH roles (customer side via region, supplier side),
    * the query shape that exercises alias-disambiguated dimension reuse.
    * Both dimension chains broadcast (region 5, nation 25, supplier is
    * the smallest fact side and AQE-broadcasts below threshold); the
    * share is a conditional/total decimal-sum pair in ONE hash aggregate
    * per year. */
  val qMarketShare = Q(
    "q_market_share",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val cnat = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"),
          col("n_regionkey").as("cn_region"))
      val snat = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(cnat), cust("c_nationkey") === col("cn_key"))
        .join(broadcast(reg), col("cn_region") === reg("r_regionkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(snat), sup("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          dsum(when(col("sn_name") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(lit(0.0)), 6).as("nation_revenue"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
            .as("total_revenue"))
        .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
          round(col("nation_revenue") / col("total_revenue"), 6)
            .as("mkt_share"))
    },
    Some(s"""WITH j AS (
        SELECT year(o_orderdate) AS o_year,
          l_extendedprice * (1 - l_discount) AS rev,
          sn.n_name AS sn_name
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey)
      SELECT o_year,
        ${dsumSql("CASE WHEN sn_name = 'NATION_3' THEN rev ELSE 0.0 END", 6)}
          AS nation_revenue,
        ${dsumSql("rev", 6)} AS total_revenue,
        round(${dsumSql("CASE WHEN sn_name = 'NATION_3' THEN rev ELSE 0.0 END",
          6)} / ${dsumSql("rev", 6)}, 6) AS mkt_share
      FROM j GROUP BY o_year"""),
    bench = true)

  /** Year-over-year revenue growth per brand: lag window over the
    * (brand, year) AGGREGATE — the frame the window sorts is
    * brands × years (bounded by the calendar, not the corpus), so the
    * per-brand sort is trivially small at any scale; the corpus-sized
    * work is one hash aggregate. Growth divides exact-decimal-derived
    * doubles and rounds 6 dp; the first year per brand has no prior and
    * is dropped (growth undefined). l_shipdate keys the year so no
    * orders join is needed. */
  val qYoyBrandGrowth = Q(
    "q_yoy_brand_growth",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val pt = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
      val byYear = li.join(pt, li("l_partkey") === pt("p_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("yr"))
      byYear
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .filter(col("prev_revenue").isNotNull)
        .select(col("p_brand"), col("yr"), col("revenue"),
          col("prev_revenue"),
          round((col("revenue") - col("prev_revenue"))
            / col("prev_revenue"), 6).as("yoy_growth"))
    },
    Some(s"""WITH by_year AS (
        SELECT p_brand, year(l_shipdate) AS yr,
          ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, year(l_shipdate)),
      lagged AS (
        SELECT p_brand, yr, revenue,
          lag(revenue) OVER (PARTITION BY p_brand ORDER BY yr)
            AS prev_revenue
        FROM by_year)
      SELECT p_brand, yr, revenue, prev_revenue,
        round((revenue - prev_revenue) / prev_revenue, 6) AS yoy_growth
      FROM lagged WHERE prev_revenue IS NOT NULL"""))

  /** Repeat-purchase cadence per customer: mean days between consecutive
    * orders — the retention metric behind replenishment campaigns.
    * One lag window PARTITIONED BY customer (bounded by orders per
    * customer, never row-grained global), gaps as integer day diffs,
    * mean = exact long sum / count rounded 6 dp. Single-order customers
    * drop (no interval defined). */
  val qRepeatInterval = Q(
    "q_repeat_purchase_interval",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("od"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od"), col("o_orderkey"))
      o.withColumn("gap", datediff(col("od"), lag(col("od"), 1).over(w)))
        .filter(col("gap").isNotNull)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_intervals"),
          round(sum(col("gap").cast("long")).cast("double")
            / count(lit(1)), 6).as("avg_gap_days"),
          max(col("gap").cast("long")).as("max_gap_days"))
    },
    Some("""WITH g AS (
        SELECT o_custkey,
          CAST(CAST(o_orderdate AS DATE)
            - lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
            AS BIGINT) AS gap
        FROM orders)
      SELECT o_custkey, count(*) AS n_intervals,
        round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS avg_gap_days,
        max(gap) AS max_gap_days
      FROM g WHERE gap IS NOT NULL GROUP BY o_custkey"""))

  /** Session-level conversion rate per day: the product-analytics KPI —
    * of the activity sessions STARTING each day, what fraction contained
    * a purchase. Sessions are the native `session_window` aggregate
    * under the repo's session contract
    * ([[graft.streaming.SessionWindows]]: 4 h gap, an event at exactly
    * the gap starts a new session), so the oracle replays the SAME
    * islands the q_sessions_gap oracle uses and adds the conversion
    * flag. Two bounded shuffles: the session aggregate keyed on user
    * (state bounded by open sessions per user), then a calendar-grain
    * day rollup. */
  val qSessionConversion = Q(
    "q_session_conversion",
    (s, d) => {
      val ev = Tables.events(s, d)
      val sess = ev
        .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("int"))
          .as("converted"))
        .select(
          date_format(col("session_window.start"), "yyyy-MM-dd").as("day"),
          col("converted"))
      sess.groupBy(col("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("converted").cast("long")).as("n_converting"))
        .select(col("day"), col("n_sessions"), col("n_converting"),
          round(col("n_converting").cast("double") / col("n_sessions"), 6)
            .as("conversion_rate"))
    },
    Some("""WITH g AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 14400000000
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, event_type,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS seq
        FROM g),
      s2 AS (
        SELECT user_id, seq, strftime(min(ts), '%Y-%m-%d') AS day,
          max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS converted
        FROM sess GROUP BY user_id, seq)
      SELECT day, count(*) AS n_sessions,
        CAST(sum(converted) AS BIGINT) AS n_converting,
        round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
          AS conversion_rate
      FROM s2 GROUP BY day"""))

  /** Referential-integrity audit across the star schema — the Deequ-style
    * constraint suite a warehouse runs before publishing: orphan facts
    * (anti-joins), duplicate keys (grouped HAVING counts), each check one
    * bounded aggregate, unioned into a single (check, violations) report.
    * Anti-joins shuffle on the key being checked; the dup checks carry
    * one row per VIOLATING key through the second aggregate — at 100 TB
    * a clean table costs one map-side-combined count, never a blowup. */
  val qRefIntegrity = Q(
    "q_ref_integrity",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      def c1(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("violations"))
          .select(lit(name).as("check"), col("violations"))
      val orphanLi = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
        "left_anti")
      val orphanOrd = ord.join(cust, ord("o_custkey") === cust("c_custkey"),
        "left_anti")
      val dupOrd = ord.groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      val dupLi = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      val dupCust = cust.groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      c1("lineitem_orphan_orders", orphanLi)
        .unionAll(c1("orders_orphan_customers", orphanOrd))
        .unionAll(c1("orders_dup_orderkey", dupOrd))
        .unionAll(c1("lineitem_dup_pk", dupLi))
        .unionAll(c1("customer_dup_custkey", dupCust))
    },
    Some("""SELECT 'lineitem_orphan_orders' AS "check", count(*) AS violations
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      UNION ALL
      SELECT 'orders_orphan_customers', count(*)
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
      UNION ALL
      SELECT 'orders_dup_orderkey', count(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey
        HAVING count(*) > 1)
      UNION ALL
      SELECT 'lineitem_dup_pk', count(*) FROM (
        SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
      UNION ALL
      SELECT 'customer_dup_custkey', count(*) FROM (
        SELECT c_custkey FROM customer GROUP BY c_custkey
        HAVING count(*) > 1)"""))

  /** Cross-border trade volume (the TPC-H Q7 shape): yearly discounted
    * revenue between every DISTINCT (supplier nation, customer nation)
    * pair — nation joined in both roles again, with the inequality
    * filter keeping only cross-border flow. Output is bounded by
    * nations² × years regardless of corpus size; the fact-side work is
    * the join chain plus ONE hash aggregate. */
  val qNationTrade = Q(
    "q_nation_trade_volume",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val cnat = Tables.nation(s, d)
        .select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))
      val snat = Tables.nation(s, d)
        .select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(cnat), cust("c_nationkey") === col("cn_key"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(snat), sup("s_nationkey") === col("sn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
    },
    Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        year(l_shipdate) AS l_year,
        ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE sn.n_name <> cn.n_name
      GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"""))

  /** Hourly error-spike detection: hours whose error-event count exceeds
    * mean + 3σ of the hourly error distribution — the ops anomaly page.
    * Two bounded aggregates: hourly counts (calendar-grain), then the
    * 1-row mean/σ broadcast back; z-scores divide exact-decimal-derived
    * doubles with oracle-identical parenthesization (σ via the same
    * (Σx², Σx, n) fused form as q_corr_matrix). Every hour is emitted
    * with its z-score and spike flag so the downstream consumer sees the
    * full series, not just alarms. */
  val qErrorSpikes = Q(
    "q_error_spike_hours",
    (s, d) => {
      val hourly = Tables.events(s, d)
        .filter(col("event_type") === "error")
        .groupBy(date_format(date_trunc("hour", col("ts")),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n_errors"))
      val stats = hourly.agg(
        count(lit(1)).as("n_hours"),
        sum(col("n_errors")).as("sx"),
        sum(col("n_errors") * col("n_errors")).as("sxx"))
      // Zero-variance guard: a degenerate series (one hour, or all hours
      // equal) has σ = 0 — emit NULL z-scores rather than engine-dependent
      // inf/NaN/NULL division results (same divergence class as the
      // q_corr_matrix guard).
      val variance = ((col("sxx").cast("double")
        - col("sx").cast("double") * col("sx") / col("n_hours"))
        / col("n_hours"))
      hourly.crossJoin(broadcast(stats))
        .select(col("hour"), col("n_errors"),
          when(variance > 0d,
            round((col("n_errors") - col("sx").cast("double") / col("n_hours"))
              / sqrt(variance), 6)).as("z_score"))
        .withColumn("is_spike", (col("z_score") > 3.0).cast("int"))
    },
    Some("""WITH hourly AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
            AS hour,
          count(*) AS n_errors
        FROM events WHERE event_type = 'error' GROUP BY 1),
      stats AS (
        SELECT count(*) AS n_hours,
          CAST(sum(n_errors) AS BIGINT) AS sx,
          CAST(sum(n_errors * n_errors) AS BIGINT) AS sxx
        FROM hourly),
      scored AS (
        SELECT hour, n_errors,
          CASE WHEN (CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx / n_hours) / n_hours > 0
            THEN round((n_errors - CAST(sx AS DOUBLE) / n_hours)
              / sqrt((CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx / n_hours) / n_hours), 6)
            ELSE NULL END AS z_score
        FROM hourly, stats)
      SELECT hour, n_errors, z_score,
        CAST(z_score > 3.0 AS INT) AS is_spike
      FROM scored"""))

  /** Weekly demand lag features per part — the feature-engineering
    * staple a forecasting pipeline materializes before training: weekly
    * quantity with lag-1, lag-4, and the trailing-4-observation moving
    * average. Lags/frames are over OBSERVED weeks (a part with a gap
    * sees its previous observation, not an imputed zero — the sparse
    * convention; `q_gap_fill_daily` is the densifying counterpart).
    *
    * Scale: one lineitem-grain hash aggregate down to (part, week),
    * then windows PARTITIONED BY part — per-partition frame cardinality
    * is bounded by the calendar (~350 weeks over the corpus span), and
    * the window exchange reuses the aggregate's part-keyed
    * partitioning. Quantities through exact decimal; the only division
    * is the 6-dp moving-average at the end, identically parenthesized
    * in the oracle. */
  val qDemandLag = Q(
    "q_demand_lag_features",
    (s, d) => {
      val weekly = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          to_date(date_trunc("week", col("l_shipdate"))).as("wk"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_dec"))
      val w = Window.partitionBy("l_partkey").orderBy("wk")
      val frame4 = w.rowsBetween(-3, 0)
      weekly.select(col("l_partkey"),
        date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("qty_dec").cast("double").as("qty"),
        lag(col("qty_dec"), 1).over(w).cast("double").as("lag1"),
        lag(col("qty_dec"), 4).over(w).cast("double").as("lag4"),
        round(sum(col("qty_dec")).over(frame4).cast("double")
          / count(lit(1)).over(frame4), 6).as("ma4"))
    },
    Some("""WITH weekly AS (
        SELECT l_partkey,
          date_trunc('week', CAST(l_shipdate AS DATE)) AS wk,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem GROUP BY 1, 2)
      SELECT l_partkey, strftime(wk, '%Y-%m-%d') AS week,
        CAST(qty_dec AS DOUBLE) AS qty,
        CAST(lag(qty_dec, 1) OVER w AS DOUBLE) AS lag1,
        CAST(lag(qty_dec, 4) OVER w AS DOUBLE) AS lag4,
        round(CAST(sum(qty_dec) OVER f AS DOUBLE)
          / count(*) OVER f, 6) AS ma4
      FROM weekly
      WINDOW w AS (PARTITION BY l_partkey ORDER BY wk),
        f AS (PARTITION BY l_partkey ORDER BY wk
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"""))

  /** ABC–XYZ inventory matrix — the planner's two-axis classification:
    * ABC = revenue concentration class (the [[qAbcPareto]] cumulative
    * share: A ≤ 80%, B ≤ 95%, C above), XYZ = demand REGULARITY class
    * from the coefficient of variation of weekly quantity (X ≤ 0.5
    * steady, Y ≤ 1.0, Z erratic). The 9-cell matrix (class pair →
    * part count + revenue share) is what drives differentiated
    * safety-stock / forecasting policy per cell.
    *
    * Scale: ONE lineitem pass down to the (part, week) grain feeds both
    * axes — revenue re-aggregates it to part grain for the distributed
    * cumulative share ([[paretoCumShare]], two-phase prefix sum — this
    * query is windowWhitelist'd for its bounded per-partition-totals
    * window like qAbcPareto); the CV axis is a part-keyed fused-moments
    * aggregate over the same frame (σ via exact sums, sqrt is
    * correctly-rounded IEEE on both engines). Final matrix is a 9-row
    * aggregate + 1-row broadcast share normalizer. */
  val qAbcXyz = Q(
    "q_abc_xyz",
    (s, d) => {
      val pw = graft.ops.CacheScope.persist(
        Tables.lineitem(s, d)
          .groupBy(col("l_partkey"),
            to_date(date_trunc("week", col("l_shipdate"))).as("wk"))
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast(DecimalType(18, 6))).as("rev_dec"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .as("qty_dec")))
      val rev = pw.groupBy(col("l_partkey"))
        .agg(sum(col("rev_dec")).as("rev_dec"))
      // rev_dec stays EXACT DECIMAL through the matrix aggregate — a
      // per-part double→DECIMAL(18,2) roundtrip here loses the 6-dp
      // tail at a different rounding mode than DuckDB (HALF_UP vs
      // half-even at .xx5000) and drifts the cell sums by cents
      val abc = paretoCumShare(rev, "l_partkey", "rev_dec")
        .select(col("l_partkey"), col("rev_dec"),
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B")
            .otherwise("C").as("abc_class"))
      val xyz = pw
        .select(col("l_partkey"), col("qty_dec").cast("double").as("q"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("nw"), dsum(col("q")).as("sq"),
          dsumWide(col("q") * col("q")).as("sq2"))
        .select(col("l_partkey"),
          when(col("sq") > 0,
            round(sqrt(greatest(
              col("nw") * col("sq2") - col("sq") * col("sq"), lit(0.0)))
              / col("sq"), 6)).as("cv"))
        .select(col("l_partkey"),
          when(col("cv") <= 0.5, "X").when(col("cv") <= 1.0, "Y")
            .otherwise("Z").as("xyz_class"))
      val cells = abc.join(xyz, Seq("l_partkey"))
        .groupBy(col("abc_class"), col("xyz_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev_dec")).as("rev"))
      val tot = cells.agg(sum(col("rev")).as("tot"))
      cells.crossJoin(broadcast(tot))
        .select(col("abc_class"), col("xyz_class"), col("n_parts"),
          round(col("rev").cast("double"), 2).as("revenue"),
          round(col("rev").cast("double") / col("tot").cast("double"), 6)
            .as("rev_share"))
    },
    Some("""WITH pw AS (
        SELECT l_partkey,
          date_trunc('week', CAST(l_shipdate AS DATE)) AS wk,
          sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS rev_dec,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem GROUP BY 1, 2),
      rev AS (
        SELECT l_partkey, sum(rev_dec) AS rev_dec FROM pw GROUP BY 1),
      pare AS (
        SELECT l_partkey, rev_dec,
          round(CAST(sum(rev_dec) OVER (ORDER BY rev_dec DESC, l_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS cum_share
        FROM rev),
      abc AS (
        SELECT l_partkey, rev_dec,
          CASE WHEN cum_share <= 0.80 THEN 'A'
               WHEN cum_share <= 0.95 THEN 'B'
               ELSE 'C' END AS abc_class
        FROM pare),
      mom AS (
        SELECT l_partkey, count(*) AS nw,
          CAST(sum(CAST(CAST(qty_dec AS DOUBLE) AS DECIMAL(18,2)))
            AS DOUBLE) AS sq,
          CAST(sum(CAST(CAST(qty_dec AS DOUBLE) * CAST(qty_dec AS DOUBLE)
            AS DECIMAL(38,12))) AS DOUBLE) AS sq2
        FROM pw GROUP BY 1),
      xyz AS (
        SELECT l_partkey,
          CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
               ELSE 'Z' END AS xyz_class
        FROM (
          SELECT l_partkey,
            CASE WHEN sq > 0 THEN
              round(sqrt(greatest(nw * sq2 - sq * sq,
                CAST(0.0 AS DOUBLE))) / sq, 6) END AS cv
          FROM mom)),
      cells AS (
        SELECT abc_class, xyz_class, count(*) AS n_parts,
          sum(rev_dec) AS rev
        FROM abc JOIN xyz USING (l_partkey)
        GROUP BY 1, 2),
      tot AS (SELECT sum(rev) AS tot FROM cells)
      SELECT abc_class, xyz_class, n_parts,
        round(CAST(rev AS DOUBLE), 2) AS revenue,
        round(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share
      FROM cells CROSS JOIN tot"""))

  /** Fulfillment-lag SLA percentiles per order priority: p50/p90/p99 of
    * days from order to line shipment — the ops dashboard's "are urgent
    * orders actually faster" readout. Shape: ONE orderkey equi-join
    * (both sides big at 100 TB → key-partitioned sort-merge; nothing is
    * broadcast) down to an integer day lag, then per-priority
    * percentile_disc — data values, no interpolation arithmetic (the
    * RFM rule) — over a handful of groups. */
  val qShipLag = Q(
    "q_ship_lag_percentiles",
    (s, d) => {
      val lag = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            to_date(col("o_orderdate")).as("od")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("sd"), col("od")).as("lag_days"))
      lag.groupBy(col("priority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_days)")
            .cast("int").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_days)")
            .cast("int").as("p90"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY lag_days)")
            .cast("int").as("p99"))
    },
    Some("""WITH lag AS (
        SELECT o_orderpriority AS priority,
          date_diff('day', CAST(o_orderdate AS DATE),
            CAST(l_shipdate AS DATE)) AS lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      SELECT priority, count(*) AS n,
        CAST(quantile_disc(lag_days, 0.5) AS INT) AS p50,
        CAST(quantile_disc(lag_days, 0.9) AS INT) AS p90,
        CAST(quantile_disc(lag_days, 0.99) AS INT) AS p99
      FROM lag GROUP BY 1"""))

  def all: Seq[Q] = Seq(
    qRfm, qAbcPareto, qElasticity, qOrderCountDist, qPromoShare,
    qReturnedItems, qLargeVolume, qMarketShare, qYoyBrandGrowth,
    qRepeatInterval, qSessionConversion, qRefIntegrity, qNationTrade,
    qErrorSpikes, qDemandLag, qAbcXyz, qShipLag)
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second analytics-query block (AnalyticsQueries is at its navigable
  * limit): growth accounting, conformance testing, and forecast
  * evaluation. Same contract as [[AnalyticsQueries]]: every entry
  * carries its own DuckDB oracle and a 100 TB scale rationale.
  */
object AnalyticsQueries2 {

  /** Weekly growth accounting — the standard user-base decomposition
    * (new / retained / resurrected / churned per period) that
    * `q_new_vs_returning`'s two-way split cannot express: a returning
    * user who skipped a week is a RESURRECTION, not a retention, and
    * churn is invisible without the forward look.
    *
    * Definitions (period = ISO week):
    *   - new         = first-ever active week,
    *   - retained    = active this week AND the immediately previous week,
    *   - resurrected = active before, but NOT the previous week,
    *   - churned(w)  = active in week w-1 and not in w (attributed to w).
    * Identity: active(w) = new + retained + resurrected, and
    * retained(w) = active(w-1) - churned(w) — the spec pins both.
    *
    * Scale: one distinct (user, week) hash agg off the scan, then a
    * lag/lead window partitioned BY USER (frame bounded by one user's
    * active-week history — weeks in the horizon, not traffic), then two
    * week-grain aggregates. Churn weeks that have zero activity of
    * their own fall out of the left join by construction (reported
    * weeks = weeks with any activity). Nothing broadcast, nothing
    * driver-side. */
  def growthAccounting(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val du = events
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("wk")
      val seq = graft.ops.CacheScope.persist(
        du.select(col("user_id"), col("wk"),
          lag(col("wk"), 1).over(w).as("prev"),
          lead(col("wk"), 1).over(w).as("next")))
      val cls = seq.groupBy(col("wk")).agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("new_users"),
        sum(when(col("prev") === date_sub(col("wk"), 7), 1L).otherwise(0L))
          .as("retained_users"),
        sum(when(col("prev").isNotNull &&
          col("prev") < date_sub(col("wk"), 7), 1L).otherwise(0L))
          .as("resurrected_users"),
        count(lit(1)).as("active_users"))
      val churn = seq
        .filter(col("next").isNull || col("next") > date_add(col("wk"), 7))
        .groupBy(date_add(col("wk"), 7).as("wk"))
        .agg(count(lit(1)).as("churned_users"))
      cls.join(churn, Seq("wk"), "left")
        .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
          col("new_users"), col("retained_users"),
          col("resurrected_users"), col("active_users"),
          coalesce(col("churned_users"), lit(0L)).as("churned_users"))
  }

  val qGrowthAccounting = Q(
    "q_growth_accounting",
    (s, d) => growthAccounting(Tables.events(s, d)),
    Some("""WITH du AS (
        SELECT DISTINCT user_id,
          date_trunc('week', CAST(ts AS DATE)) AS wk FROM events),
      seq AS (
        SELECT user_id, wk, lag(wk) OVER w AS prev, lead(wk) OVER w AS next
        FROM du WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
      cls AS (
        SELECT wk,
          CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS new_users,
          CAST(sum(CASE WHEN prev = wk - 7 THEN 1 ELSE 0 END) AS BIGINT)
            AS retained_users,
          CAST(sum(CASE WHEN prev IS NOT NULL AND prev < wk - 7
            THEN 1 ELSE 0 END) AS BIGINT) AS resurrected_users,
          CAST(count(*) AS BIGINT) AS active_users
        FROM seq GROUP BY 1),
      ch AS (
        SELECT wk + 7 AS wk, CAST(count(*) AS BIGINT) AS churned_users
        FROM seq WHERE next IS NULL OR next > wk + 7 GROUP BY 1)
      SELECT strftime(cls.wk, '%Y-%m-%d') AS week, new_users,
        retained_users, resurrected_users, active_users,
        COALESCE(churned_users, 0) AS churned_users
      FROM cls LEFT JOIN ch ON cls.wk = ch.wk"""),
    bench = true)

  /** Benford's-law expected first-digit frequencies, log10(1+1/d)
    * rounded to 12 dp and pinned as SHARED LITERALS on both engines —
    * a computed log10 could differ in the last ulp between libms
    * (the ext_bootstrap_mean_ci rule). */
  private val benfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
    4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
    7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)

  /** Benford first-digit conformance over order totals — the standard
    * forensic-accounting / fraud screen: the leading significant digit
    * of naturally-occurring amounts follows P(d) = log10(1+1/d); a
    * fabricated book deviates. Emits the 9-digit observed-vs-expected
    * table plus the chi-square distance (the synthetic totals are
    * near-uniform in [1.3k, 500k], so the pinned readout is a LARGE
    * chi2 — the test correctly flags non-Benford data; the spec pins a
    * constructed log-uniform sample as conforming).
    *
    * First digit is extracted from the DECIMAL(18,2) string rendering
    * (identical on both engines for positive amounts), never via
    * floor(x/10^floor(log10 x)) — a libm log10 in the digit path could
    * misclassify exact powers of ten.
    *
    * Scale: one projection + one hash agg onto AT MOST 9 keys, a 9-row
    * digit spine left join (missing digits still contribute n*p to
    * chi2), and a 1-row broadcast total. Flat at any input size. */
  val qBenford = Q(
    "q_benford_first_digit",
    (s, d) => {
      val counts = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .groupBy(substring(
          col("o_totalprice").cast(DecimalType(18, 2)).cast("string"),
          1, 1).as("digit"))
        .agg(count(lit(1)).as("observed"))
      val spine = s.range(1, 10)
        .select(col("id").cast("string").as("digit"))
      val expected = benfordP.tail.foldLeft(
        when(col("digit") === benfordP.head._1.toString,
          benfordP.head._2)) { case (acc, (dg, p)) =>
        acc.when(col("digit") === dg.toString, p)
      }
      val perDigit = spine.join(counts, Seq("digit"), "left")
        .select(col("digit"),
          coalesce(col("observed"), lit(0L)).as("observed"),
          expected.as("expected_frac"))
      val n = perDigit.agg(sum(col("observed")).as("n"))
      val terms = graft.ops.CacheScope.persist(
        perDigit.crossJoin(broadcast(n))
          .withColumn("exp_cnt", col("n") * col("expected_frac"))
          .withColumn("term", round(
            (col("observed") - col("exp_cnt")) *
              (col("observed") - col("exp_cnt")) / col("exp_cnt"), 6)))
      val chi2 = terms.agg(
        round(Det.dsumWide(col("term")), 6).as("chi_square"))
      terms.crossJoin(broadcast(chi2))
        .select(col("digit"), col("observed"),
          round(col("observed").cast("double") / col("n"), 6)
            .as("observed_frac"),
          col("expected_frac"), col("term").as("chi2_term"),
          col("chi_square"))
    },
    Some {
      val pCase = benfordP.map { case (dg, p) =>
        s"WHEN '$dg' THEN $p" }.mkString(" ")
      s"""WITH counts AS (
        SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            AS VARCHAR), 1, 1) AS digit,
          CAST(count(*) AS BIGINT) AS observed
        FROM orders WHERE o_totalprice > 0 GROUP BY 1),
      spine AS (
        SELECT CAST(d AS VARCHAR) AS digit,
          CASE CAST(d AS VARCHAR) $pCase END AS expected_frac
        FROM (SELECT unnest(generate_series(1, 9)) AS d)),
      per AS (
        SELECT digit, COALESCE(observed, 0) AS observed, expected_frac
        FROM spine LEFT JOIN counts USING (digit)),
      tot AS (SELECT sum(observed) AS n FROM per),
      terms AS (
        SELECT digit, observed, expected_frac, n,
          round((observed - n * expected_frac)
            * (observed - n * expected_frac)
            / (n * expected_frac), 6) AS term
        FROM per, tot),
      chi AS (SELECT ${Det.dsumWideSql("term")} AS raw FROM terms)
      SELECT digit, observed,
        round(CAST(observed AS DOUBLE) / n, 6) AS observed_frac,
        expected_frac, term AS chi2_term,
        round((SELECT raw FROM chi), 6) AS chi_square
      FROM terms"""
    })

  /** Rolling-origin forecast backtest — the model-evaluation stage a
    * demand pipeline runs AFTER `q_demand_lag_features` builds its
    * inputs: two baseline forecasters (naive = last week's quantity;
    * MA4 = mean of the PRIOR four weeks — strictly lagged, unlike the
    * feature query's trailing-inclusive ma4) scored per part over every
    * week where both are defined (≥ 5th observed week), with MAE and
    * RMSE per model. The readout ranks parts by forecastability and
    * tells the planner where the naive baseline is already sufficient.
    *
    * Determinism: weekly quantities are exact DECIMAL(18,2) sums; the
    * MA4 divides by the frame's pinned width 4 (a power of two — the
    * division is IEEE-exact); per-week error terms round to 6 dp before
    * the DECIMAL(38,12) fold; RMSE takes sqrt (correctly-rounded IEEE
    * on both engines) of the 6-dp mean, then rounds 6 dp.
    *
    * Scale: the (part, week) grain is one hash agg off the scan; all
    * windows partition BY PART over calendar-bounded weekly frames
    * (the q_demand_lag_features shape); the final metrics re-aggregate
    * the same frame at part grain. No broadcast, no driver loop. */
  val qForecastBacktest = Q(
    "q_forecast_backtest",
    (s, d) => {
      val weekly = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          to_date(date_trunc("week", col("l_shipdate"))).as("wk"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("qty_dec"))
      val w = Window.partitionBy("l_partkey").orderBy("wk")
      val f4 = w.rowsBetween(-4, -1)
      val scored = weekly.select(col("l_partkey"),
        col("qty_dec").cast("double").as("qty"),
        lag(col("qty_dec"), 1).over(w).cast("double").as("naive"),
        when(lag(col("qty_dec"), 4).over(w).isNotNull,
          round(sum(col("qty_dec")).over(f4).cast("double") / 4, 6))
          .as("ma4"))
        .filter(col("ma4").isNotNull)
        .withColumn("ae_naive", round(abs(col("qty") - col("naive")), 6))
        .withColumn("ae_ma4", round(abs(col("qty") - col("ma4")), 6))
        .withColumn("se_naive", round((col("qty") - col("naive"))
          * (col("qty") - col("naive")), 6))
        .withColumn("se_ma4", round((col("qty") - col("ma4"))
          * (col("qty") - col("ma4")), 6))
      scored.groupBy(col("l_partkey")).agg(
        count(lit(1)).as("n_eval"),
        round(Det.dsumWide(col("ae_naive")) / count(lit(1)), 6)
          .as("mae_naive"),
        round(Det.dsumWide(col("ae_ma4")) / count(lit(1)), 6)
          .as("mae_ma4"),
        round(sqrt(round(Det.dsumWide(col("se_naive")) / count(lit(1)),
          6)), 6).as("rmse_naive"),
        round(sqrt(round(Det.dsumWide(col("se_ma4")) / count(lit(1)),
          6)), 6).as("rmse_ma4"))
    },
    Some(s"""WITH weekly AS (
        SELECT l_partkey,
          date_trunc('week', CAST(l_shipdate AS DATE)) AS wk,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        FROM lineitem GROUP BY 1, 2),
      scored0 AS (
        SELECT l_partkey, CAST(qty_dec AS DOUBLE) AS qty,
          CAST(lag(qty_dec, 1) OVER w AS DOUBLE) AS naive,
          CASE WHEN lag(qty_dec, 4) OVER w IS NOT NULL THEN
            round(CAST(sum(qty_dec) OVER f AS DOUBLE) / 4, 6) END AS ma4
        FROM weekly
        WINDOW w AS (PARTITION BY l_partkey ORDER BY wk),
          f AS (PARTITION BY l_partkey ORDER BY wk
            ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING)),
      scored AS (
        SELECT l_partkey,
          round(abs(qty - naive), 6) AS ae_naive,
          round(abs(qty - ma4), 6) AS ae_ma4,
          round((qty - naive) * (qty - naive), 6) AS se_naive,
          round((qty - ma4) * (qty - ma4), 6) AS se_ma4
        FROM scored0 WHERE ma4 IS NOT NULL)
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_eval,
        round(${Det.dsumWideSql("ae_naive")} / count(*), 6) AS mae_naive,
        round(${Det.dsumWideSql("ae_ma4")} / count(*), 6) AS mae_ma4,
        round(sqrt(round(${Det.dsumWideSql("se_naive")} / count(*), 6)),
          6) AS rmse_naive,
        round(sqrt(round(${Det.dsumWideSql("se_ma4")} / count(*), 6)),
          6) AS rmse_ma4
      FROM scored GROUP BY 1"""))

  /** Baskets with more distinct items than this are EXCLUDED from
    * basket mining BY CONTRACT (pair lift and triples): the self-join
    * volume per order is C(basket, k), so one pathological basket — a
    * bot, a wholesale feed, a data error with 10⁴ distinct parts —
    * alone emits C(10⁴,3) ≈ 1.7×10¹¹ candidate rows from a single
    * join key, the hub blowup capped everywhere else in the repo
    * ([[graft.ext.Graph.linkPrediction]]'s maxDeg,
    * sharedFramePairs' maxDocsPerFrame, the cosine buckets'
    * maxBucketRows). Real checkout baskets are single digits; 200 is
    * far above any genuine co-purchase signal, and a 200+-item basket
    * contributes only noise pairs anyway. The oracle applies the same
    * cap, so the hash gate still checks. */
  val DefaultMaxBasket = 200L

  /** Frequent 3-itemsets over order baskets — see [[qBasketTriples]].
    * Exposed with the `maxBasket` contract parameterized so the spec
    * can pin an over-cap basket's exclusion with a small cap. */
  /** Shared basket materialization for the 3-itemset miners: the capped
    * orders' DISTINCT items collected into one ASCENDING array per order.
    * The maxBasket gate runs on the bounded count aggregate BEFORE any
    * array exists, so a pathological hot order never materializes its
    * item list; collect_list state is therefore ≤ maxBasket elements.
    * The (l_orderkey)-keyed collect rides the join's partitioning — no
    * extra exchange. */
  private def saneBaskets(lineitem: DataFrame, maxBasket: Long)
      : DataFrame = {
    val raw = lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val sane = raw.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__bs"))
      .filter(col("__bs") <= maxBasket)
      .select(col("l_orderkey"))
    raw.join(sane, Seq("l_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("__ps"))
  }

  /** Ordered combinations from the sorted basket array, generated
    * LOCALLY (posexplode + slice of the strictly-ascending suffix) —
    * p1 < p2 (< p3) holds by construction, each combination exactly
    * once. Replaces the r13 self-equi-joins: same Σ C(basket, k)
    * candidate volume, but produced map-side off the basket cache
    * instead of through two pair/triple-sized sort-merge joins (two
    * full candidate-stream sorts removed; measured r14). */
  private def basketPairsExp(baskets: DataFrame): DataFrame =
    baskets
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "p1")))
      .select(col("p1"),
        explode(slice(col("__ps"), col("__i") + lit(2),
          size(col("__ps")))).as("p2"))

  private def basketTriplesExp(baskets: DataFrame): DataFrame =
    baskets
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "p1")))
      .select(col("p1"),
        slice(col("__ps"), col("__i") + lit(2), size(col("__ps")))
          .as("__r"))
      .select(col("p1"), col("__r"),
        posexplode(col("__r")).as(Seq("__j", "p2")))
      .select(col("p1"), col("p2"),
        explode(slice(col("__r"), col("__j") + lit(2),
          size(col("__r")))).as("p3"))

  def basketTriples(lineitem: DataFrame, maxBasket: Long = DefaultMaxBasket)
      : DataFrame = {
    val baskets = graft.ops.CacheScope.persist(
      saneBaskets(lineitem, maxBasket))
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    basketTriplesExp(baskets)
      .groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("p3"), col("support"),
        round(col("support").cast("double") / col("n_orders"), 9)
          .as("support_frac"))
  }

  /** Frequent 3-itemsets over order baskets — the next frequent-pattern
    * size up from `q_basket_pair_lift`'s pairs (the Apriori step a
    * recommender's "bought together" bundle mining needs): triples
    * ordered p1 < p2 < p3 with support ≥ 2 orders, plus the support
    * fraction over the basket count.
    *
    * Scale: candidates are generated LOCALLY off the per-order basket
    * array ([[basketTriplesExp]] — ordered suffix expansion, no
    * self-join) — the candidate volume is Σ_orders C(basket_size, 3),
    * bounded by the per-order item count (single digits in practice)
    * AND by the [[DefaultMaxBasket]] contract (a pre-agg on the bounded
    * count grain drops pathological baskets BEFORE any array is
    * collected, so no single hot key can blow up either the collect
    * state or the candidate volume); the triple-key hash agg prunes
    * with map-side partial counts. The basket-count normalizer is a
    * 1-row broadcast over the POST-CAP basket universe. */
  val qBasketTriples = Q(
    "q_basket_triples",
    (s, d) => basketTriples(Tables.lineitem(s, d)),
    Some(s"""WITH items0 AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      sane AS (
        SELECT l_orderkey FROM items0
        GROUP BY 1 HAVING count(*) <= $DefaultMaxBasket),
      items AS (
        SELECT i.* FROM items0 i JOIN sane USING (l_orderkey)),
      tri AS (
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
          CAST(count(*) AS BIGINT) AS support
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
          AND a.l_partkey < b.l_partkey
        JOIN items c ON b.l_orderkey = c.l_orderkey
          AND b.l_partkey < c.l_partkey
        GROUP BY 1, 2, 3),
      n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items)
      SELECT p1, p2, p3, support,
        round(CAST(support AS DOUBLE) / n_orders, 9) AS support_frac
      FROM tri CROSS JOIN n WHERE support >= 2"""),
    bench = true)

  /** Daily open-order concurrency curve — the sweep-line readout over
    * order-fulfillment intervals (order date → last shipment): how many
    * orders are in flight on each boundary day, with the day's opened /
    * closed counts. The operations dashboard shape for any
    * interval-valued fact (rentals, sessions, loans).
    *
    * Scale: intervals collapse to the DAY-GRAIN boundary spine first
    * (one orderkey-keyed join + two day-grain hash aggs — +1 events at
    * the start day, −1 events the day AFTER the end), and the running
    * concurrency is a cumulative window over that spine — one row per
    * calendar day, bounded by the horizon, never row-grained
    * (windowWhitelist'd like q_gap_fill_daily's calendar spine).
    * Orders with no shipments have no fulfillment interval and are
    * excluded by the inner join (they are `q_orders_without_lineitems`'s
    * subject). */
  val qOpenOrdersDaily = Q(
    "q_open_orders_daily",
    (s, d) => {
      val iv = Tables.orders(s, d)
        .join(Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(to_date(col("l_shipdate"))).as("end_day")),
          col("o_orderkey") === col("l_orderkey"))
        .select(to_date(col("o_orderdate")).as("start_day"),
          col("end_day"))
      val ivP = graft.ops.CacheScope.persist(iv)
      val starts = ivP.groupBy(col("start_day").as("day"))
        .agg(count(lit(1)).as("opened"))
      val ends = ivP.groupBy(date_add(col("end_day"), 1).as("day"))
        .agg(count(lit(1)).as("closed"))
      val spine = starts.join(ends, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("opened"), lit(0L)).as("opened"),
          coalesce(col("closed"), lit(0L)).as("closed"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      spine.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("opened"), col("closed"),
        sum(col("opened") - col("closed")).over(w).as("open_count"))
    },
    Some("""WITH iv AS (
        SELECT CAST(o_orderdate AS DATE) AS start_day, end_day
        FROM orders JOIN (
          SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS end_day
          FROM lineitem GROUP BY 1) li
        ON o_orderkey = l_orderkey),
      st AS (SELECT start_day AS day, CAST(count(*) AS BIGINT) AS opened
        FROM iv GROUP BY 1),
      en AS (SELECT end_day + 1 AS day, CAST(count(*) AS BIGINT) AS closed
        FROM iv GROUP BY 1),
      spine AS (
        SELECT COALESCE(st.day, en.day) AS day,
          COALESCE(opened, 0) AS opened, COALESCE(closed, 0) AS closed
        FROM st FULL OUTER JOIN en ON st.day = en.day)
      SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
        CAST(sum(opened - closed)
          OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS open_count
      FROM spine"""))

  /** Top user-journey paths — the full-sequence companion to
    * `q_markov_transitions`' bigram matrix: each user's FIRST five
    * events (by time, ties by event_id) joined into a `>`-path string,
    * path frequencies plus how many of those users convert (a
    * `purchase` inside the window). The onboarding-flow readout: which
    * openings are common, and which convert.
    *
    * Scale: the per-user prefix is cut FIRST with a row_number window
    * partitioned BY USER (frame = one user's events — and only ≤ 5
    * rows survive it into the collect), so the ordered-list aggregate
    * assembles at most 5 structs per user; the path-grain count is a
    * hash agg onto |types|⁵-bounded keys. Nothing collects an
    * unbounded event history. */
  val qJourneyPaths = Q(
    "q_top_journey_paths",
    (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val firstN = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
      val paths = firstN.groupBy(col("user_id"))
        .agg(concat_ws(">", transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      paths.groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("path").contains("purchase"), 1L).otherwise(0L))
            .as("n_converting"))
        .withColumn("conversion_rate",
          round(col("n_converting").cast("double") / col("n_users"), 6))
    },
    Some("""WITH firstn AS (
        SELECT user_id, event_type, rn FROM (
          SELECT user_id, event_type,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS rn
          FROM events)
        WHERE rn <= 5),
      paths AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM firstn GROUP BY 1)
      SELECT path, CAST(count(*) AS BIGINT) AS n_users,
        CAST(sum(CASE WHEN path LIKE '%purchase%' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_converting,
        round(CAST(sum(CASE WHEN path LIKE '%purchase%' THEN 1 ELSE 0
          END) AS DOUBLE) / count(*), 6) AS conversion_rate
      FROM paths GROUP BY 1"""))

  /** Customer-value quartile migration between the two halves of the
    * horizon (split at 1996-01-01, the CUPED boundary) — the
    * "customer movement" readout behind retention programs: a 5×5
    * matrix of (H1 quartile → H2 quartile), with quartile 0 = inactive
    * in that half, so new, churned, and cross-quartile movers are all
    * one matrix.
    *
    * Quartiles come from DISC-percentile EDGES broadcast back onto the
    * per-customer spend frame (1 + count of edges strictly below) —
    * never a global ntile window: the edge frame is one aggregate row,
    * the assignment a projection, so nothing row-grained funnels
    * through one task (the quantileBins shape). Per-half spends are
    * exact decimal sums.
    *
    * Output: (q_h1, q_h2, n_customers). */
  val qValueMigration = Q(
    "q_customer_value_migration",
    (s, d) => {
      val split = lit("1996-01-01").cast("date")
      def half(pre: Boolean): org.apache.spark.sql.DataFrame = {
        val f = if (pre) to_date(col("o_orderdate")) < split
          else to_date(col("o_orderdate")) >= split
        val spend = graft.ops.CacheScope.persist(
          Tables.orders(s, d).filter(f)
            .groupBy(col("o_custkey"))
            .agg(Det.dsum(col("o_totalprice")).as("v")))
        // distributed disc-percentile edges (a global percentile_disc
        // buffers every distinct spend in one task at 100 TB —
        // graft.ext.Stats.distDiscPercentiles has the rationale)
        val edges = graft.ext.Stats.distDiscPercentiles(spend, "v",
          Seq((1, 4), (2, 4), (3, 4)), Seq("e1", "e2", "e3"))
        spend.crossJoin(broadcast(edges))
          .select(col("o_custkey"),
            ((1 to 3).map(i => when(col("v") > col(s"e$i"), 1)
              .otherwise(0)).reduce(_ + _) + 1).cast("int").as("q"))
      }
      half(pre = true).withColumnRenamed("q", "q_h1")
        .join(half(pre = false).withColumnRenamed("q", "q_h2"),
          Seq("o_custkey"), "full_outer")
        .groupBy(coalesce(col("q_h1"), lit(0)).as("q_h1"),
          coalesce(col("q_h2"), lit(0)).as("q_h2"))
        .agg(count(lit(1)).as("n_customers"))
    },
    Some(s"""WITH h1 AS (
        SELECT o_custkey, ${Det.dsumSql("o_totalprice")} AS v
        FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        GROUP BY 1),
      e1 AS (SELECT quantile_disc(v, 0.25) AS e1,
        quantile_disc(v, 0.50) AS e2, quantile_disc(v, 0.75) AS e3
        FROM h1),
      q1 AS (
        SELECT o_custkey, CAST(1
          + (CASE WHEN v > e1 THEN 1 ELSE 0 END)
          + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
          + (CASE WHEN v > e3 THEN 1 ELSE 0 END) AS INT) AS q_h1
        FROM h1 CROSS JOIN e1),
      h2 AS (
        SELECT o_custkey, ${Det.dsumSql("o_totalprice")} AS v
        FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        GROUP BY 1),
      e2x AS (SELECT quantile_disc(v, 0.25) AS e1,
        quantile_disc(v, 0.50) AS e2, quantile_disc(v, 0.75) AS e3
        FROM h2),
      q2 AS (
        SELECT o_custkey, CAST(1
          + (CASE WHEN v > e1 THEN 1 ELSE 0 END)
          + (CASE WHEN v > e2 THEN 1 ELSE 0 END)
          + (CASE WHEN v > e3 THEN 1 ELSE 0 END) AS INT) AS q_h2
        FROM h2 CROSS JOIN e2x)
      SELECT COALESCE(q_h1, 0) AS q_h1, COALESCE(q_h2, 0) AS q_h2,
        CAST(count(*) AS BIGINT) AS n_customers
      FROM q1 FULL OUTER JOIN q2 USING (o_custkey)
      GROUP BY 1, 2"""))

  /** Growth accounting as a STRUCTURED STREAM — the stateful twin of
    * [[qGrowthAccounting]] ([[graft.streaming.GrowthStream]] carries
    * the finality and absence-detection design: weeks classify once
    * the watermark passes their end; CHURN is an event-time TIMEOUT —
    * no arriving event can signal an absence). The streamed fact rows
    * aggregate to the week grain; the oracle replays the batch
    * decomposition under the same watermark cutoff (weeks whose end
    * ≤ max(ts) − 7d; churn weeks need their own end settled too) —
    * the q_stream_markov_transitions discipline. Weeks whose only
    * fact is churn appear with active 0 (unlike the batch query's
    * active-weeks-only frame — the streaming surface reports every
    * settled fact). */
  val qStreamGrowth = Q(
    "q_stream_growth_accounting",
    (s, d) => {
      val rows = graft.streaming.StreamPipeline
        .growthLifecycleAvailableNow(s, d)
      rows.groupBy(date_format(
          expr("date_from_unix_date(cast(week_day as int))"),
          "yyyy-MM-dd").as("week"))
        .agg(
          sum(when(col("cls") === "new", 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("cls") === "retained", 1L).otherwise(0L))
            .as("retained_users"),
          sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
            .as("resurrected_users"),
          sum(when(col("cls") =!= "churned", 1L).otherwise(0L))
            .as("active_users"),
          sum(when(col("cls") === "churned", 1L).otherwise(0L))
            .as("churned_users"))
    },
    Some("""WITH wm AS (
        SELECT (epoch_us(max(ts)) // 1000) - 604800000 AS wm_ms
        FROM events),
      du AS (
        SELECT DISTINCT user_id,
          date_trunc('week', CAST(ts AS DATE)) AS wk FROM events),
      fin AS (
        SELECT user_id, wk FROM du, wm
        WHERE epoch_ms(CAST(wk + 7 AS TIMESTAMP)) <= wm_ms),
      seq AS (
        SELECT user_id, wk, lag(wk) OVER w AS prev, lead(wk) OVER w AS next
        FROM fin WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
      cls AS (
        SELECT user_id, wk,
          CASE WHEN prev IS NULL THEN 'new'
               WHEN prev = wk - 7 THEN 'retained'
               ELSE 'resurrected' END AS cls
        FROM seq),
      churn AS (
        SELECT user_id, wk + 7 AS wk, 'churned' AS cls
        FROM seq, wm
        WHERE (next IS NULL OR next > wk + 7)
          AND epoch_ms(CAST(wk + 14 AS TIMESTAMP)) <= wm_ms),
      allr AS (
        SELECT * FROM cls UNION ALL SELECT * FROM churn)
      SELECT strftime(wk, '%Y-%m-%d') AS week,
        CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
          AS new_users,
        CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
          AS BIGINT) AS retained_users,
        CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
          AS BIGINT) AS resurrected_users,
        CAST(sum(CASE WHEN cls != 'churned' THEN 1 ELSE 0 END)
          AS BIGINT) AS active_users,
        CAST(sum(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)
          AS BIGINT) AS churned_users
      FROM allr GROUP BY 1"""))

  /** Cohort LTV curves — the MONEY companion to `q_cohort_retention`'s
    * user counts: customers grouped by first-order month, revenue
    * accumulated by month-age, normalized per cohort member — the
    * payback-period readout ("month-3 LTV of the Jan cohort").
    *
    * Scale: one order scan to (customer, month) grain; the cohort
    * month is a customer-keyed min agg joined back; the curve is a
    * (cohort, age)-grain hash agg with a COHORT-partitioned cumulative
    * window (frame bounded by the horizon's month count). Revenue
    * stays exact DECIMAL through the cumulative — window order cannot
    * move the hash. */
  val qCohortLtv = Q(
    "q_cohort_ltv_curve",
    (s, d) => {
      val om = Tables.orders(s, d).select(col("o_custkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("om"),
        col("o_totalprice"))
      val cohort = graft.ops.CacheScope.persist(
        om.groupBy(col("o_custkey")).agg(min(col("om")).as("cm")))
      val rev = om.join(cohort, Seq("o_custkey"))
        .groupBy(col("cm"),
          ((year(col("om")) * 12 + month(col("om")))
            - (year(col("cm")) * 12 + month(col("cm")))).as("age"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .as("rev_dec"))
      val sizes = cohort.groupBy(col("cm"))
        .agg(count(lit(1)).as("n_customers"))
      val w = Window.partitionBy("cm").orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.withColumn("cum_dec", sum(col("rev_dec")).over(w))
        .join(sizes, Seq("cm"))
        .select(date_format(col("cm"), "yyyy-MM").as("cohort"),
          col("age"), col("n_customers"),
          col("rev_dec").cast("double").as("revenue"),
          col("cum_dec").cast("double").as("cum_revenue"),
          round(col("cum_dec").cast("double") / col("n_customers"), 6)
            .as("ltv_per_customer"))
    },
    Some("""WITH om AS (
        SELECT o_custkey,
          date_trunc('month', CAST(o_orderdate AS DATE)) AS om,
          o_totalprice
        FROM orders),
      cohort AS (
        SELECT o_custkey, min(om) AS cm FROM om GROUP BY 1),
      rev AS (
        SELECT cm,
          (year(om) * 12 + month(om)) - (year(cm) * 12 + month(cm))
            AS age,
          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM om JOIN cohort USING (o_custkey)
        GROUP BY 1, 2),
      sizes AS (
        SELECT cm, CAST(count(*) AS BIGINT) AS n_customers
        FROM cohort GROUP BY 1),
      curve AS (
        SELECT cm, age, rev_dec,
          sum(rev_dec) OVER (PARTITION BY cm ORDER BY age
            ROWS UNBOUNDED PRECEDING) AS cum_dec
        FROM rev)
      SELECT strftime(cm, '%Y-%m') AS cohort, CAST(age AS INT) AS age,
        n_customers,
        CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(cum_dec AS DOUBLE) AS cum_revenue,
        round(CAST(cum_dec AS DOUBLE) / n_customers, 6)
          AS ltv_per_customer
      FROM curve JOIN sizes USING (cm)"""))

  /** Sessions via Spark's NATIVE `session_window` aggregation
    * ([[graft.streaming.StreamPipeline.sessionWindowNativeAvailableNow]])
    * — the built-in dynamic-gap operator next to the custom
    * flatMapGroupsWithState sessionizer (`q_stream_sessions_state`).
    * Oracle replays island sessionization with the operator's exact
    * rules — pinned EMPIRICALLY by the StreamingSpec boundary test:
    * an event at EXACTLY the 30-minute gap still MERGES (touching
    * windows coalesce; only a strictly larger gap starts a new
    * session), session end = last event + gap, and append emits
    * sessions whose end ≤ the final watermark (max ts − 2 h, the
    * q_stream_markov cutoff discipline). */
  val qStreamSessionNative = Q(
    "q_stream_session_window_native",
    (s, d) => graft.streaming.StreamPipeline
      .sessionWindowNativeAvailableNow(s, d),
    Some("""WITH wm AS (
        SELECT (epoch_us(max(ts)) // 1000) - 7200000 AS wm_ms
        FROM events),
      e AS (
        SELECT user_id, event_id, ts, epoch_us(ts) // 1000 AS ms, value
        FROM events),
      seq AS (
        SELECT user_id, event_id, ts, ms, value,
          CASE WHEN lag(ms) OVER w IS NULL
            OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS nf
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      sid AS (
        SELECT user_id, ts, ms, value,
          sum(nf) OVER (PARTITION BY user_id ORDER BY ms, event_id
            ROWS UNBOUNDED PRECEDING) AS sid
        FROM seq),
      sess AS (
        SELECT user_id, sid, min(ts) AS st,
          max(ms) + 1800000 AS end_ms,
          CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            AS total_value
        FROM sid GROUP BY 1, 2)
      SELECT user_id, strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
        strftime(epoch_ms(end_ms), '%Y-%m-%d %H:%M:%S') AS session_end,
        n_events, total_value
      FROM sess, wm WHERE end_ms <= wm_ms"""))

  /** Return rate by delivery speed — the operations readout that joins
    * the fulfillment-lag family (`q_ship_lag_percentiles`) to the
    * returns family: line items bucketed by order→ship lag (weeks),
    * each bucket's return rate. A rising curve is the
    * slow-delivery-drives-returns signal CX teams act on.
    *
    * Rows with ship date BEFORE order date are excluded — physically
    * impossible lags are data noise (the synthetic dates draw the two
    * columns independently; a real book would route them to the DQ
    * report instead).
    *
    * Scale: ONE orderkey-partitioned join (both sides big — nothing
    * broadcast), a pure bucketing projection (integer `div`, no libm),
    * and a hash agg onto week buckets bounded by the horizon's week
    * count, with map-side partials. */
  val qReturnByLag = Q(
    "q_return_rate_by_lag",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"),
          col("l_returnflag"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("sd") >= col("od"))
        .select(expr("datediff(sd, od) div 7").as("lag_weeks"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
        .groupBy(col("lag_weeks"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("ret")).as("n_returned"))
        .withColumn("return_rate",
          round(col("n_returned").cast("double") / col("n_items"), 6))
    },
    Some("""SELECT
        date_diff('day', CAST(o_orderdate AS DATE),
          CAST(l_shipdate AS DATE)) // 7 AS lag_weeks,
        CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_returned,
        round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          AS DOUBLE) / count(*), 6) AS return_rate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
      GROUP BY 1"""))

  /** TYPE-2 SLOWLY-CHANGING DIMENSION build from a change feed — the
    * dimension-history shape every warehouse load needs: per user, the
    * validity intervals of their event_type "segment" (consecutive
    * duplicates collapsed — a no-op change opens no new version),
    * valid_from = the change's event time, valid_to = the next change's
    * (NULL + is_current=1 on the open version).
    *
    * Scale: two windows, BOTH partitioned by user_id (high-cardinality
    * key — never a global sort): lag to detect changes, lead over the
    * surviving change rows to close intervals. Total order within a
    * user is (ts, event_id), so same-millisecond events cannot flip
    * versions between engines. One shuffle on user_id reused by both
    * windows (same partitioning). */
  def scd2(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("vt", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("segment"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("vt"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        when(col("vt").isNull, 1).otherwise(0).as("is_current"))
  }

  val qScd2 = Q(
    "q_scd2_user_segments",
    (s, d) => scd2(Tables.events(s, d)),
    Some("""WITH chg AS (
        SELECT user_id, event_id, ts, event_type,
          lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      f AS (
        SELECT user_id, event_id, ts, event_type FROM chg
        WHERE prev IS NULL OR prev <> event_type),
      iv AS (
        SELECT user_id, event_type AS segment, ts,
          lead(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS vt
        FROM f)
      SELECT user_id, segment,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
        CASE WHEN vt IS NULL THEN 1 ELSE 0 END AS is_current
      FROM iv"""))

  /** Revenue ROLLUP over the region → nation hierarchy — the
    * grouping-sets report surface (leaf, per-region subtotal, grand
    * total in ONE pass): Spark's `rollup` expands each row to its 3
    * grouping sets before one hash agg (a bounded ×levels multiplier
    * with map-side partials — one shuffle, not one query per level).
    * Dimension joins broadcast (nation/region are tiny); the fact
    * shuffle keys on custkey. grouping_id disambiguates a NULL key
    * from a rolled-up one. */
  val qRollup = Q(
    "q_sales_rollup_region",
    (s, d) => {
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("o_totalprice"))
      base.rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("revenue"),
          grouping_id().cast("int").as("lvl"))
        .select(col("r_name"), col("n_name"), col("lvl"),
          col("n_orders"), col("revenue"))
    },
    Some(s"""SELECT r_name, n_name,
        CAST(GROUPING(r_name) AS INTEGER) * 2
          + CAST(GROUPING(n_name) AS INTEGER) AS lvl,
        CAST(count(*) AS BIGINT) AS n_orders,
        ${Det.dsumSql("o_totalprice")} AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)"""))

  /** Revenue CUBE over two NON-hierarchical dimensions (region ×
    * order status) — the grouping-sets completion of [[qRollup]]: all
    * four groupings (leaf, per-region, per-status, grand total) in ONE
    * pass. Spark's `cube` is one Expand (×4 row multiplier, map-side
    * partials absorb it) feeding ONE hash agg — never four scans;
    * `grouping_id` disambiguates a genuinely-NULL key from a
    * rolled-up one (lvl bit 2 = r_name grouped, bit 1 = status
    * grouped). Dimension joins broadcast; the fact shuffle keys on
    * custkey. The oracle is the UNION ALL of the four groupings —
    * proving the Expand plan computes exactly the four-query
    * semantics, not relying on the oracle engine's own CUBE. */
  val qCube = Q(
    "q_sales_cube",
    (s, d) => {
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("o_orderstatus"), col("o_totalprice"))
      base.cube(col("r_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("revenue"),
          grouping_id().cast("int").as("lvl"))
        .select(col("r_name"), col("o_orderstatus"), col("lvl"),
          col("n_orders"), col("revenue"))
    },
    Some {
      val base = """FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey"""
      val agg = s"CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${Det.dsumSql("o_totalprice")} AS revenue"
      s"""SELECT r_name, o_orderstatus, 0 AS lvl, $agg
        $base GROUP BY r_name, o_orderstatus
      UNION ALL
      SELECT r_name, NULL AS o_orderstatus, 1 AS lvl, $agg
        $base GROUP BY r_name
      UNION ALL
      SELECT NULL AS r_name, o_orderstatus, 2 AS lvl, $agg
        $base GROUP BY o_orderstatus
      UNION ALL
      SELECT NULL AS r_name, NULL AS o_orderstatus, 3 AS lvl, $agg
        $base"""
    })

  /** Explicit GROUPING SETS — the third grouping surface next to
    * [[qRollup]] (hierarchy) and [[qCube]] (full cross): a report
    * wanting exactly (region × priority), (region × status), and the
    * grand total — no other combinations — states precisely those
    * three sets and still pays ONE Expand (×3) + ONE hash agg, not
    * three queries. grouping_id disambiguates (bit per column,
    * 1 = aggregated away: sets land at lvl 1, 2, 7). The SQL form is
    * the only Spark surface for arbitrary set lists, so the query
    * registers its base frame as a temp view and goes through
    * `spark.sql` — the mixed DataFrame/SQL posture a real report
    * layer uses. Oracle: UNION ALL of the three groupings. */
  val qGroupingSets = Q(
    "q_sales_grouping_sets",
    (s, d) => {
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("o_orderpriority"),
          col("o_orderstatus"), col("o_totalprice"))
      // UNIQUE view name, dropped immediately after analysis:
      // spark.sql resolves the view reference eagerly into the
      // returned plan, so the drop is safe — and a fixed global name
      // would race concurrent builders on one session and leak a view
      // into every later query
      val vn = "graft_gs_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      base.createOrReplaceTempView(vn)
      try s.sql(s"""SELECT r_name, o_orderpriority, o_orderstatus,
          CAST(grouping_id() AS INT) AS lvl,
          count(1) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS revenue
        FROM $vn
        GROUP BY GROUPING SETS (
          (r_name, o_orderpriority), (r_name, o_orderstatus), ())""")
      finally { s.catalog.dropTempView(vn); () }
    },
    Some {
      val base = """FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey"""
      val agg = s"CAST(count(*) AS BIGINT) AS n_orders, " +
        s"${Det.dsumSql("o_totalprice")} AS revenue"
      s"""SELECT r_name, o_orderpriority, NULL AS o_orderstatus,
          1 AS lvl, $agg
        $base GROUP BY r_name, o_orderpriority
      UNION ALL
      SELECT r_name, NULL AS o_orderpriority, o_orderstatus,
          2 AS lvl, $agg
        $base GROUP BY r_name, o_orderstatus
      UNION ALL
      SELECT NULL AS r_name, NULL AS o_orderpriority,
          NULL AS o_orderstatus, 7 AS lvl, $agg
        $base"""
    })

  /** Streaming SCD2 — the stateful twin of [[qScd2]]
    * ([[graft.streaming.Scd2Stream]] carries the finality rule and the
    * bounded-state design): closed versions emit exactly once when
    * their closing change event settles below the watermark; the
    * oracle replays the batch lag/lead chain with that cutoff (closed
    * versions only, vt below max ts − 2 h — the q_stream_markov
    * discipline). */
  val qScd2Stream = Q(
    "q_stream_scd2_versions",
    (s, d) => graft.streaming.StreamPipeline.scd2AvailableNow(s, d),
    Some("""WITH wm AS (
        SELECT (epoch_us(max(ts)) // 1000) - 7200000 AS wm_ms
        FROM events),
      chg AS (
        SELECT user_id, event_id, ts, event_type,
          lag(event_type) OVER w AS prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      f AS (
        SELECT user_id, event_id, ts, event_type FROM chg
        WHERE prev IS NULL OR prev <> event_type),
      iv AS (
        SELECT user_id, event_type AS segment, ts,
          lead(ts) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS vt
        FROM f)
      SELECT user_id, segment,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to
      FROM iv, wm
      WHERE vt IS NOT NULL AND epoch_us(vt) // 1000 < wm_ms"""))

  /** [[qBasketTriples]] with the APRIORI candidate prune — identical
    * output (same oracle), different plan: frequent pairs (the L2 set,
    * support ≥ 2) are mined first, and the triple-candidate self-joins
    * are SEMI-JOINED against L2 on every sub-pair before counting.
    * Lossless by the Apriori property (a triple with support ≥ 2 has
    * all three sub-pairs at support ≥ 2), and the standard trade: two
    * extra pair-keyed joins buy a candidate space bounded by frequent
    * pairs instead of all basket combinations — the win grows with
    * basket size and sparsity (on 100 TB web baskets L2 is orders of
    * magnitude smaller than raw C(basket,2)). Benched next to the
    * direct plan. */
  def basketTriplesApriori(lineitem: DataFrame,
      maxBasket: Long = DefaultMaxBasket): DataFrame = {
    val baskets = graft.ops.CacheScope.persist(
      saneBaskets(lineitem, maxBasket))
    // L2 = frequent pairs, generated locally off the basket cache
    // (basketPairsExp — no pair self-join) and pruned by support
    val l2 = graft.ops.CacheScope.persist(
      basketPairsExp(baskets)
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).as("n2"))
        .filter(col("n2") >= 2)
        .select(col("p1"), col("p2")))
    // candidate triples: expand pairs WITH their ascending suffix, prune
    // against L2 BEFORE fanning out p3 (the Apriori step — the suffix
    // array rides the semi join so the surviving pairs expand in place,
    // bounded by basket size, instead of re-joining the items table),
    // then close under the remaining two pair constraints
    val tri = baskets
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "p1")))
      .select(col("p1"),
        slice(col("__ps"), col("__i") + lit(2), size(col("__ps")))
          .as("__r"))
      .select(col("p1"), col("__r"),
        posexplode(col("__r")).as(Seq("__j", "p2")))
      .select(col("p1"), col("p2"),
        slice(col("__r"), col("__j") + lit(2), size(col("__r")))
          .as("__r2"))
      .join(l2, Seq("p1", "p2"), "left_semi")
      .select(col("p1"), col("p2"), explode(col("__r2")).as("p3"))
      .join(l2.toDF("p2", "p3"), Seq("p2", "p3"), "left_semi")
      .join(l2.toDF("p1", "p3"), Seq("p1", "p3"), "left_semi")
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    tri.groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("p3"), col("support"),
        round(col("support").cast("double") / col("n_orders"), 9)
          .as("support_frac"))
  }

  /** Apriori-pruned 3-itemsets — output-identical to
    * [[qBasketTriples]] (the oracle is shared verbatim), plan-level
    * alternative per [[basketTriplesApriori]]. */
  val qBasketTriplesApriori = Q(
    "q_basket_triples_apriori",
    (s, d) => basketTriplesApriori(Tables.lineitem(s, d)),
    qBasketTriples.oracle,
    bench = true)

  /** PIVOT surface — order counts and revenue per priority, fanned
    * wide by status: Spark's `groupBy().pivot(values)` with the value
    * list PINNED (an unpinned pivot runs a driver-side distinct scan
    * first — the 100 TB anti-pattern; with values given, the plan is
    * ONE hash agg over conditional projections, exactly the CASE-sum
    * replay the oracle runs). Missing cells coalesce to 0 so the wide
    * schema is total. */
  val qPivot = Q(
    "q_pivot_priority_status",
    (s, d) => {
      val wide = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("o_totalprice")).as("rev"))
      wide.select(col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("n_f"),
        coalesce(col("O_n"), lit(0L)).as("n_o"),
        coalesce(col("P_n"), lit(0L)).as("n_p"),
        coalesce(col("F_rev"), lit(0.0)).as("rev_f"),
        coalesce(col("O_rev"), lit(0.0)).as("rev_o"),
        coalesce(col("P_rev"), lit(0.0)).as("rev_p"))
    },
    Some {
      def n(v: String) =
        s"CAST(sum(CASE WHEN o_orderstatus = '$v' THEN 1 ELSE 0 END) AS BIGINT)"
      def r(v: String) =
        s"""COALESCE(CAST(sum(CASE WHEN o_orderstatus = '$v'
           THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)"""
      s"""SELECT o_orderpriority,
        ${n("F")} AS n_f, ${n("O")} AS n_o, ${n("P")} AS n_p,
        ${r("F")} AS rev_f, ${r("O")} AS rev_o, ${r("P")} AS rev_p
      FROM orders GROUP BY 1"""
    })

  /** LEAD-LAG CROSS-CORRELATION between the hourly view and purchase
    * series — "do purchases follow views, and by how many hours?": for
    * each lag k ∈ [−3, 3], the Pearson correlation of v(t) with
    * p(t + k) over the hours where both series exist. The argmax lag
    * is the conversion-latency readout a marketing dashboard plots;
    * the k = 0 column doubles as plain same-hour correlation.
    *
    * Scale: the raw events collapse to TWO hour-grain count frames
    * first (hash aggs — the only scans of the big table); the lag
    * fan-out (×7) and the shifted equi-join then run on the BOUNDED
    * hourly frames, and each lag's Pearson r folds from fused exact
    * integer sums (n, Σx, Σy, Σxy, Σx², Σy²) in one hash agg — the
    * q_corr_matrix discipline: both engines divide identical exact
    * inputs, operands promote to double BEFORE multiplying, identical
    * parenthesization, 6-dp round, degenerate variance → NULL. */
  val qLeadLag = Q(
    "q_leadlag_correlation",
    (s, d) => {
      val ev = Tables.events(s, d)
      def hourly(t: String, cnt: String) = ev
        .filter(col("event_type") === t)
        .groupBy(expr("unix_micros(date_trunc('HOUR', ts))" +
          " div 3600000000").as("hr"))
        .agg(count(lit(1)).as(cnt))
      val v = hourly("view", "x")
      val p = hourly("purchase", "y")
        .select(col("hr").as("hr_p"), col("y"))
      val joined = v
        .withColumn("lag", explode(array((-3 to 3).map(lit(_)): _*)))
        .join(p, col("hr_p") === col("hr") + col("lag"))
      val g = joined.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val nd = col("n_hours").cast("double")
      val vx = nd * col("sxx") - col("sx").cast("double") * col("sx")
      val vy = nd * col("syy") - col("sy").cast("double") * col("sy")
      g.select(col("lag"), col("n_hours"),
        when(vx > 0d && vy > 0d,
          round((nd * col("sxy")
            - col("sx").cast("double") * col("sy"))
            / sqrt(vx * vy), 6)).as("r"))
    },
    Some("""WITH v AS (
        SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
          CAST(count(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'view' GROUP BY 1),
      p AS (
        SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr_p,
          CAST(count(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      lags AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag),
      j AS (
        SELECT lag, x, y FROM v CROSS JOIN lags
        JOIN p ON hr_p = hr + lag),
      g AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(x * y) AS BIGINT) AS sxy,
          CAST(sum(x * x) AS BIGINT) AS sxx,
          CAST(sum(y * y) AS BIGINT) AS syy
        FROM j GROUP BY 1)
      SELECT lag, n AS n_hours,
        CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
          THEN round((CAST(n AS DOUBLE) * sxy
            - CAST(sx AS DOUBLE) * sy)
            / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
            6) END AS r
      FROM g"""))

  /** DAY-OF-WEEK SEASONAL INDEX of order revenue — the multiplicative
    * seasonality table a demand forecast deseasonalizes with (index
    * 1.0 = an average day; the `q_forecast_backtest` family's missing
    * seasonal leg): per weekday, mean daily revenue over the overall
    * mean daily revenue. Two hash aggs (7-key and 1-row) + a broadcast
    * — nothing row-grained survives the first agg. Exact decimal
    * revenue sums and integer distinct-day counts divide in the same
    * parenthesization on both engines; 6-dp round. */
  val qSeasonalIndex = Q(
    "q_seasonal_index_dow",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderdate").cast("date").as("dt"),
          col("o_totalprice"))
      val byDow = o.groupBy(dayofweek(col("dt")).as("dow"))
        .agg(countDistinct(col("dt")).as("n_days"),
          Det.dsum(col("o_totalprice")).as("revenue"))
      val tot = o.agg(countDistinct(col("dt")).as("nt"),
        Det.dsum(col("o_totalprice")).as("rt"))
      byDow.crossJoin(broadcast(tot))
        .select(col("dow"), col("n_days"), col("revenue"),
          round((col("revenue") / col("n_days").cast("double"))
            / (col("rt") / col("nt").cast("double")), 6)
            .as("seasonal_index"))
    },
    Some(s"""WITH o AS (
        SELECT CAST(o_orderdate AS DATE) AS dt, o_totalprice
        FROM orders),
      d AS (
        SELECT CAST(dayofweek(dt) + 1 AS INTEGER) AS dow,
          CAST(count(DISTINCT dt) AS BIGINT) AS n_days,
          ${Det.dsumSql("o_totalprice")} AS revenue
        FROM o GROUP BY 1),
      t AS (
        SELECT CAST(count(DISTINCT dt) AS BIGINT) AS nt,
          ${Det.dsumSql("o_totalprice")} AS rt
        FROM o)
      SELECT dow, n_days, revenue,
        round((revenue / CAST(n_days AS DOUBLE))
          / (rt / CAST(nt AS DOUBLE)), 6) AS seasonal_index
      FROM d, t"""))

  /** BACKLOG AGING at a snapshot date — the fulfillment-ops matrix
    * (`q_open_orders_daily` gives the concurrency CURVE; this gives
    * one day's open book broken down by HOW LONG each order has been
    * waiting × priority — the "what should ship first" report): orders
    * placed by the snapshot whose first shipment (if any) is still in
    * the future, bucketed by age. One orderkey-grain min-agg + one
    * left join + a bounded (bucket × priority) hash agg; exact decimal
    * value sums. Never-shipped orders (no lineitems or all shipments
    * after D) count as open — the left join's NULL first-ship. */
  val qBacklogAging = Q(
    "q_backlog_aging",
    (s, d) => {
      val D = lit("1998-06-30").cast("date")
      val firstShip = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_shipdate").cast("date")).as("fs"))
      Tables.orders(s, d)
        .join(firstShip, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(col("o_orderdate").cast("date") <= D &&
          (col("fs").isNull || col("fs") > D))
        .withColumn("age", datediff(D, col("o_orderdate").cast("date")))
        .withColumn("age_bucket",
          when(col("age") <= 7, "a_00_07")
            .when(col("age") <= 30, "b_08_30")
            .when(col("age") <= 90, "c_31_90")
            .otherwise("d_90_plus"))
        .groupBy(col("age_bucket"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("open_value"))
    },
    Some(s"""WITH fs AS (
        SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS fs
        FROM lineitem GROUP BY 1),
      open_book AS (
        SELECT o.*,
          date_diff('day', CAST(o_orderdate AS DATE),
            DATE '1998-06-30') AS age
        FROM orders o LEFT JOIN fs ON o_orderkey = l_orderkey
        WHERE CAST(o_orderdate AS DATE) <= DATE '1998-06-30'
          AND (fs IS NULL OR fs > DATE '1998-06-30'))
      SELECT CASE WHEN age <= 7 THEN 'a_00_07'
          WHEN age <= 30 THEN 'b_08_30'
          WHEN age <= 90 THEN 'c_31_90'
          ELSE 'd_90_plus' END AS age_bucket,
        o_orderpriority,
        CAST(count(*) AS BIGINT) AS n_orders,
        ${Det.dsumSql("o_totalprice")} AS open_value
      FROM open_book GROUP BY 1, 2"""))

  /** NEW-vs-REPEAT revenue split per month — the acquisition-vs-
    * retention readout every e-commerce P&L opens with: each order is
    * "new" iff it lands in its customer's FIRST order month, and the
    * month grain reports both segments' order counts and exact-decimal
    * revenue plus the repeat share. Shape: one custkey-grain min-agg
    * (the first-order month), one custkey equi-join back, one bounded
    * (month)-grain agg — no windows, every shuffle keyed high-
    * cardinality until the final bounded grain. */
  val qNewVsRepeat = Q(
    "q_new_vs_repeat_revenue",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      val firstMon = o.groupBy(col("o_custkey"))
        .agg(min(col("mon")).as("first_mon"))
      o.join(firstMon, Seq("o_custkey"))
        .withColumn("is_new", (col("mon") === col("first_mon"))
          .cast("int"))
        .groupBy(col("mon"))
        .agg(
          sum(col("is_new")).as("new_orders"),
          sum(lit(1) - col("is_new")).as("repeat_orders"),
          Det.dsum(when(col("is_new") === 1, col("o_totalprice"))
            .otherwise(lit(null))).as("new_revenue"),
          Det.dsum(when(col("is_new") === 0, col("o_totalprice"))
            .otherwise(lit(null))).as("repeat_revenue"))
        .select(col("mon"), col("new_orders"), col("repeat_orders"),
          coalesce(col("new_revenue"), lit(0.0)).as("new_revenue"),
          coalesce(col("repeat_revenue"), lit(0.0))
            .as("repeat_revenue"),
          round(col("repeat_orders")
            / (col("new_orders") + col("repeat_orders")).cast("double"),
            6).as("repeat_share"))
    },
    Some(s"""WITH o AS (
        SELECT o_custkey, o_totalprice,
          strftime(o_orderdate, '%Y-%m') AS mon
        FROM orders),
      fm AS (
        SELECT o_custkey, min(mon) AS first_mon FROM o GROUP BY 1),
      t AS (
        SELECT o.mon,
          CASE WHEN o.mon = fm.first_mon THEN 1 ELSE 0 END AS is_new,
          o.o_totalprice
        FROM o JOIN fm USING (o_custkey)),
      g AS (
        SELECT mon,
          CAST(sum(is_new) AS BIGINT) AS new_orders,
          CAST(sum(1 - is_new) AS BIGINT) AS repeat_orders,
          CAST(sum(CASE WHEN is_new = 1
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
            AS new_revenue,
          CAST(sum(CASE WHEN is_new = 0
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
            AS repeat_revenue
        FROM t GROUP BY 1)
      SELECT mon, new_orders, repeat_orders,
        COALESCE(new_revenue, 0.0) AS new_revenue,
        COALESCE(repeat_revenue, 0.0) AS repeat_revenue,
        round(repeat_orders
          / CAST(new_orders + repeat_orders AS DOUBLE), 6)
          AS repeat_share
      FROM g"""))

  /** BLOOM SEMI-JOIN REDUCTION ([[graft.ops.BloomSemiJoin]] carries the
    * sideways-information-passing design and the past-broadcast-budget
    * rationale): monthly order volume/revenue for ONE selective
    * customer slice (BUILDING segment, nation 5 — 12 of 1 500
    * customers at sf0.01), with the fact side cut MAP-SIDE by the
    * dim-key bitmap before any exchange. The exact semi-join still
    * runs, so the oracle states the PLAIN semi-join form —
    * hash-equality proves the reduction transparent. */
  val qBloomSemijoin = Q(
    "q_bloom_semijoin_orders",
    (s, d) => {
      val dim = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING"
          && col("c_nationkey") === 5)
        .select(col("c_custkey"))
      val pre = graft.ops.BloomSemiJoin.prefilteredSemiJoin(
        Tables.orders(s, d), "o_custkey", dim, "c_custkey")
      pre.groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("revenue"))
    },
    Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS mon,
        count(*) AS n_orders,
        ${Det.dsumSql("o_totalprice")} AS revenue
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM customer c
        WHERE c.c_custkey = o.o_custkey
          AND c.c_mktsegment = 'BUILDING' AND c.c_nationkey = 5)
      GROUP BY 1"""))

  def all: Seq[Q] = Seq(qGrowthAccounting, qBenford, qForecastBacktest,
    qBasketTriples, qOpenOrdersDaily, qJourneyPaths, qValueMigration,
    qStreamGrowth, qCohortLtv, qStreamSessionNative, qReturnByLag,
    qScd2, qRollup, qCube, qGroupingSets, qScd2Stream,
    qBasketTriplesApriori, qPivot,
    qLeadLag, qSeasonalIndex, qBacklogAging, qNewVsRepeat,
    qBloomSemijoin)
}

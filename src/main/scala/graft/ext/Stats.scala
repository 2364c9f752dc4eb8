package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics over the corpus — the validation/readout
  * math a data pipeline runs on its own outputs: Poisson-bootstrap
  * confidence intervals (uncertainty without resampling passes) and
  * categorical mutual information (feature/metadata association).
  * Single-pass aggregate shapes throughout; nothing here scales with
  * anything but the category/replica grain after the first fold.
  */
object Stats {

  /** Cumulative Poisson(1) probabilities for the inverse-CDF draw,
    * pinned as shared literals (NOT computed — e^-1 on two libms could
    * differ in the last ulp; a literal cannot). Mass beyond k=7 (1e-5)
    * collapses into k=8. */
  val poissonCum: Seq[Double] = Seq(
    0.367879441, 0.735758882, 0.919698603, 0.981011843,
    0.996340153, 0.999405815, 0.999916758, 0.999989750)

  private def poissonDraw(u: Column): Column =
    poissonCum.zipWithIndex.reverse.foldLeft(lit(8L)) {
      case (acc, (t, k)) => when(u < lit(t), lit(k.toLong)).otherwise(acc)
    }

  /** Poisson bootstrap of a mean (Chamandy et al. 2012, the
    * one-pass bootstrap for data too large to resample): every row
    * enters replica b with weight ~ Poisson(1), drawn deterministically
    * from md5(seed:b:id), so B resamples cost ONE scan with B weighted
    * conditional sums folded map-side — no B× data blowup, no shuffle
    * of row-grain data at all (the aggregate emits a single row of 2B
    * exact integers, reshaped to replica grain driver-free via
    * posexplode). The CI columns are percentile_disc data values over
    * the B-row replica frame (no interpolation arithmetic), broadcast
    * back onto every row.
    *
    * `valueCol` must be integral so the weighted sums stay exact.
    * Output: (replica, n_eff, mean, ci_lo, ci_hi) — B rows. */
  def bootstrapMeanCi(rows: DataFrame, idCol: String, valueCol: String,
      reps: Int = 32, seed: String = "boot",
      loP: Double = 0.025, hiP: Double = 0.975): DataFrame = {
    val aggs = (0 until reps).flatMap { b =>
      val u = conv(substring(md5(concat(lit(s"$seed:$b:"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("double") /
        lit(4294967296.0)
      val w = poissonDraw(u)
      Seq(sum(w).as(s"n_$b"),
        sum(w * col(valueCol).cast("long")).as(s"s_$b"))
    }
    val one = rows.agg(aggs.head, aggs.tail: _*)
    val per = one.select(posexplode(array((0 until reps).map(b =>
        struct(col(s"n_$b").as("n"), col(s"s_$b").as("s"))): _*))
        .as(Seq("replica", "r")))
      .select(col("replica"), col("r.n").as("n_eff"),
        (col("r.s").cast("double") / col("r.n")).as("mean"))
    val perC = graft.ops.CacheScope.persist(per)
    val ci = perC.agg(
      expr(s"percentile_disc($loP) WITHIN GROUP (ORDER BY mean)")
        .as("ci_lo"),
      expr(s"percentile_disc($hiP) WITHIN GROUP (ORDER BY mean)")
        .as("ci_hi"))
    perC.crossJoin(broadcast(ci))
  }

  /** DuckDB replay of [[bootstrapMeanCi]] over the documents table —
    * identical md5 draw ladder, replica sums, and disc-percentile CI.
    * (The oracle may materialize the B× row blowup the Spark side
    * avoids — it runs at oracle SF, not at 100 TB.) */
  def bootstrapOracleSql(idCol: String, valueCol: String,
      reps: Int = 32, seed: String = "boot", loP: Double = 0.025,
      hiP: Double = 0.975): String = {
    val ladder = poissonCum.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString(" ")
    s"""WITH reps AS (SELECT unnest(generate_series(0, ${reps - 1})) AS b),
      draws AS (
        SELECT b,
          CASE $ladder ELSE 8 END AS w,
          $valueCol AS v
        FROM (
          SELECT b, $idCol, $valueCol,
            ('0x' || substring(md5('$seed:' || b || ':'
              || CAST($idCol AS VARCHAR)), 1, 8))::BIGINT
              / CAST(4294967296.0 AS DOUBLE) AS u
          FROM documents CROSS JOIN reps)),
      per AS (
        SELECT b AS replica, CAST(sum(w) AS BIGINT) AS n_eff,
          CAST(CAST(sum(w * v) AS BIGINT) AS DOUBLE)
            / CAST(sum(w) AS BIGINT) AS mean
        FROM draws GROUP BY 1),
      ci AS (
        SELECT quantile_disc(mean, $loP) AS ci_lo,
          quantile_disc(mean, $hiP) AS ci_hi
        FROM per)
      SELECT replica, n_eff, mean, ci_lo, ci_hi
      FROM per CROSS JOIN ci"""
  }

  /** Mutual information between two categorical columns, in nats, with
    * the marginal entropies and the normalized MI
    * (MI/√(H(a)·H(b)) — the feature-association readout): everything
    * derives from the JOINT-CELL frame (one hash aggregate over the
    * input; marginals and the total re-aggregate those cells, never the
    * input), so past the first fold the cost is |A|·|B| cells. Each
    * cell's ln is rounded 6 dp then weighted by the exact count ratio
    * and summed through DECIMAL(38,12); counts promote to double BEFORE
    * multiplying so a 10¹³·10¹³ product cannot overflow a long.
    * Output: one row (n, mi, h_a, h_b, nmi). */
  def mutualInformation(rows: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    val cells = graft.ops.CacheScope.persist(
      rows.groupBy(col(aCol).as("a"), col(bCol).as("b"))
        .agg(count(lit(1)).as("n_ab")))
    val ma = cells.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val mb = cells.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    val tot = cells.agg(sum(col("n_ab")).as("n"))
    val term = (col("n_ab").cast("double") / col("n")) *
      round(log((col("n_ab").cast("double") * col("n")) /
        (col("n_a").cast("double") * col("n_b"))), 6)
    val mi = cells.join(ma, Seq("a")).join(mb, Seq("b"))
      .crossJoin(broadcast(tot))
      .agg(round(graft.Det.dsumWide(term), 6).as("mi"))
    def entropy(m: DataFrame, cnt: String, out: String): DataFrame = m
      .crossJoin(broadcast(tot))
      .agg(round(-graft.Det.dsumWide(
        (col(cnt).cast("double") / col("n")) *
          round(log(col(cnt).cast("double") / col("n")), 6)), 6).as(out))
    mi.crossJoin(broadcast(entropy(ma, "n_a", "h_a")))
      .crossJoin(broadcast(entropy(mb, "n_b", "h_b")))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("mi"), col("h_a"), col("h_b"),
        when(col("h_a") > 0 && col("h_b") > 0,
          round(col("mi") / sqrt(col("h_a") * col("h_b")), 6)).as("nmi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `valueCol`
    * distributions of two groups — the exact distribution-drift test
    * next to the binned PSI (`ext_signal_drift_psi`): D = max over the
    * merged support of |F_A(v) − F_B(v)|, plus the √(n_A·n_B/(n_A+n_B))
    * scaled statistic the asymptotic p-value reads from.
    *
    * Scale: the input collapses to the DISTINCT-VALUE grain first (one
    * hash aggregate carrying both samples' counts per value); the two
    * CDFs then come from the packOffsets two-phase prefix sum — range
    * partition by value, per-partition totals for BOTH counters
    * broadcast back, local running sums — so no single task ever sorts
    * the full support (doc lengths alone have millions of distinct
    * values at corpus scale). D is one max aggregate over exact-integer
    * ratios; ties in value are handled by the grain itself (one row per
    * value, both CDFs step together).
    *
    * Output: one row (n_a, n_b, d_stat, ks_stat), 6-dp. */
  /** The two-sample merged-support CDF shared by [[ksTest]] and
    * [[wasserstein1]]: (cdf(v, __pid, ca, cb, cuma, cumb), tot(n_a,
    * n_b)) on the packOffsets two-phase prefix-sum path. The cdf
    * frame's partitioning column rides along so callers can run
    * further per-partition windows on the same exchange. */
  private def mergedCdf(rows: DataFrame, valueCol: String,
      groupCol: String, groupA: String, groupB: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val grain = rows
      .filter(col(groupCol).isin(groupA, groupB))
      // raw-column grain (no long cast): the oracle groups the raw v,
      // and a cast would merge distinct doubles into one rank group
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    // persisted: both the totals pass and the final pass re-derive
    // __pid from the range exchange (the packOffsets boundary rule)
    val sorted = graft.ops.CacheScope.persist(
      grain.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid"))
      .agg(sum(col("ca")).as("__pa"), sum(col("cb")).as("__pb"))
      .withColumn("__oa", coalesce(sum(col("__pa")).over(offW), lit(0L)))
      .withColumn("__ob", coalesce(sum(col("__pb")).over(offW), lit(0L)))
      .select(col("__pid"), col("__oa"), col("__ob"))
    val tot = sorted.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val localW = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = sorted.join(broadcast(offs), Seq("__pid"))
      .withColumn("cuma", col("__oa") + sum(col("ca")).over(localW))
      .withColumn("cumb", col("__ob") + sum(col("cb")).over(localW))
    (cdf, tot)
  }

  def ksTest(rows: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    val (cdf, tot) = mergedCdf(rows, valueCol, groupCol, groupA, groupB)
    val gaps = cdf
      .crossJoin(broadcast(tot))
      .select(abs(col("cuma").cast("double") / col("n_a")
        - col("cumb").cast("double") / col("n_b")).as("gap"))
    gaps.agg(round(max(col("gap")), 6).as("d_stat"))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), col("d_stat"),
        round(sqrt((col("n_a").cast("double") * col("n_b"))
          / (col("n_a") + col("n_b"))) * col("d_stat"), 6).as("ks_stat"))
  }

  /** Two-sample WASSERSTEIN-1 (earth-mover) distance between the
    * `valueCol` distributions of two groups — the INTEGRAL drift
    * metric next to the exact-max KS and the binned PSI/JSD: where KS
    * reports only the worst CDF gap, W1 = ∫|F_A − F_B| dv prices HOW
    * MUCH mass moved HOW FAR (in value units) — the number a
    * length-distribution or score-distribution drift alarm should
    * threshold on.
    *
    * Computation: on the merged distinct-value support,
    * W1 = Σ_i |F_A(v_i) − F_B(v_i)| · (v_{i+1} − v_i) — exact for any
    * discrete/empirical pair, no binning. The lead over the two-phase
    * layout is distributed: within-partition lead plus each
    * partition's successor-first-value (a #partitions-row frame)
    * joined back for boundary rows; the last support point's term is
    * 0 by definition (both CDFs are 1 there).
    *
    * Determinism: per-step |ΔF| is 6-dp-rounded, the step product
    * rides the exact DECIMAL(38,12) sum (the mutualInformation
    * pattern), final 6-dp round. Output: (n_a, n_b, w1). */
  def wasserstein1(rows: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cdf, tot) = mergedCdf(rows, valueCol, groupCol, groupA, groupB)
    val firstW = Window.orderBy("__pid")
    val nextFirst = cdf.groupBy(col("__pid"))
      .agg(min(col("v")).as("__fv"))
      .withColumn("__nfv", lead(col("__fv"), 1).over(firstW))
      .select(col("__pid"), col("__nfv"))
    val leadW = Window.partitionBy("__pid").orderBy("v")
    val terms = cdf.join(broadcast(nextFirst), Seq("__pid"))
      .withColumn("__nv",
        coalesce(lead(col("v"), 1).over(leadW), col("__nfv")))
      .crossJoin(broadcast(tot))
      .select(when(col("__nv").isNotNull,
        round(abs(col("cuma").cast("double") / col("n_a")
          - col("cumb").cast("double") / col("n_b")), 6)
          * (col("__nv") - col("v")).cast("double"))
        .otherwise(lit(0.0)).as("t"))
    terms
      .agg(round(graft.Det.dsumWide(col("t")), 6).as("w1"))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"), col("w1"))
  }

  /** DuckDB replay of [[wasserstein1]] (single-window at oracle SF):
    * `fromSql` must yield columns (v, grp). */
  def wasserstein1OracleSql(fromSql: String, groupA: String,
      groupB: String): String =
    s"""WITH base AS ($fromSql),
      grain AS (
        SELECT v,
          CAST(sum(CASE WHEN grp = '$groupA' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN grp = '$groupB' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM base WHERE grp IN ('$groupA', '$groupB') GROUP BY 1),
      tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b
        FROM grain),
      cum AS (
        SELECT v, sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
          lead(v) OVER (ORDER BY v) AS nv
        FROM grain
        WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
      terms AS (
        SELECT CASE WHEN nv IS NULL THEN 0.0
          ELSE round(abs(CAST(cuma AS DOUBLE) / n_a
            - CAST(cumb AS DOUBLE) / n_b), 6)
            * CAST(nv - v AS DOUBLE) END AS t
        FROM cum CROSS JOIN tot)
      SELECT n_a, n_b,
        round(CAST(sum(CAST(t AS DECIMAL(38,12))) AS DOUBLE), 6) AS w1
      FROM terms CROSS JOIN tot
      GROUP BY n_a, n_b"""

  /** DuckDB replay of [[ksTest]] (single-window CDF — it runs at
    * oracle SF): `fromSql` must yield columns (v, grp). */
  def ksTestOracleSql(fromSql: String, groupA: String, groupB: String)
      : String =
    s"""WITH base AS ($fromSql),
      grain AS (
        SELECT v,
          CAST(sum(CASE WHEN grp = '$groupA' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN grp = '$groupB' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM base WHERE grp IN ('$groupA', '$groupB') GROUP BY 1),
      tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b
        FROM grain),
      cum AS (
        SELECT abs(CAST(sum(ca) OVER w AS DOUBLE) / n_a
          - CAST(sum(cb) OVER w AS DOUBLE) / n_b) AS gap
        FROM grain CROSS JOIN tot
        WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)),
      dd AS (SELECT round(max(gap), 6) AS d_stat FROM cum)
      SELECT n_a, n_b, d_stat,
        round(sqrt((CAST(n_a AS DOUBLE) * n_b) / (n_a + n_b))
          * d_stat, 6) AS ks_stat
      FROM dd CROSS JOIN tot"""

  /** DuckDB replay of [[mutualInformation]]: `fromSql` must yield
    * columns (a, b). */
  def mutualInformationOracleSql(fromSql: String): String =
    s"""WITH base AS ($fromSql),
      cells AS MATERIALIZED (
        SELECT a, b, count(*) AS n_ab FROM base GROUP BY 1, 2),
      ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
        FROM cells GROUP BY 1),
      mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b
        FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cells),
      mi AS (
        SELECT round(CAST(sum(CAST(
          (CAST(n_ab AS DOUBLE) / n) * round(ln(
            (CAST(n_ab AS DOUBLE) * n)
            / (CAST(n_a AS DOUBLE) * n_b)), 6)
          AS DECIMAL(38,12))) AS DOUBLE), 6) AS mi
        FROM cells JOIN ma USING (a) JOIN mb USING (b)
        CROSS JOIN tot),
      ha AS (
        SELECT round(-CAST(sum(CAST(
          (CAST(n_a AS DOUBLE) / n)
            * round(ln(CAST(n_a AS DOUBLE) / n), 6)
          AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_a
        FROM ma CROSS JOIN tot),
      hb AS (
        SELECT round(-CAST(sum(CAST(
          (CAST(n_b AS DOUBLE) / n)
            * round(ln(CAST(n_b AS DOUBLE) / n), 6)
          AS DECIMAL(38,12))) AS DOUBLE), 6) AS h_b
        FROM mb CROSS JOIN tot)
      SELECT n, mi, h_a, h_b,
        CASE WHEN h_a > 0 AND h_b > 0 THEN
          round(mi / sqrt(h_a * h_b), 6) END AS nmi
      FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN tot"""

  /** ln(2) as a shared literal — a computed log(2) could differ in the
    * last ulp between libms (the pinned-constant rule). */
  private val Ln2 = 0.693147180559945

  /** Mann–Whitney U (Wilcoxon rank-sum) between two groups' value
    * distributions — the nonparametric LOCATION-shift test next to the
    * exact-shape KS ([[ksTest]]): U detects "source B's documents run
    * longer" even when the CDFs never separate by much at one point.
    * Ties use midranks with the standard tie-corrected normal
    * approximation.
    *
    * Exactness: everything folds at the DISTINCT-VALUE grain with
    * integer counts; rank sums are carried DOUBLED (2R is integral
    * under midranks) through DECIMAL(38,0) so no floating addition
    * ever happens — u2 = 2·U is exact; only the final z goes through
    * doubles (products promoted to double BEFORE multiplying, the
    * mutualInformation overflow rule; sqrt is correctly-rounded IEEE).
    *
    * Scale: the [[ksTest]] shape — one value-grain hash agg, then the
    * packOffsets two-phase prefix sum for the cumulative-below
    * counters (range partition by value, per-partition totals
    * broadcast back); no task ever sorts the full support. The tie
    * term Σ(t³−t) re-aggregates the same grain.
    *
    * Output: one row (n_a, n_b, u2_a, z), z 6-dp (NULL when either
    * side is empty or the variance degenerates). */
  def mannWhitney(rows: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val grain = rows
      .filter(col(groupCol).isin(groupA, groupB))
      // raw-column grain (no long cast): the oracle groups the raw v,
      // and a cast would merge distinct doubles into one rank group
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb"))
    val sorted = graft.ops.CacheScope.persist(
      grain.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid"))
      .agg(sum(col("ca") + col("cb")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val localW = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec = DecimalType(38, 0)
    val terms = sorted.join(broadcast(offs), Seq("__pid"))
      .withColumn("below",
        col("__off") + coalesce(sum(col("ca") + col("cb")).over(localW),
          lit(0L)))
      // per-value doubled midrank mass for group A, and the tie term
      .withColumn("r2a", col("ca").cast(dec) *
        (lit(2).cast(dec) * col("below").cast(dec)
          + col("ca").cast(dec) + col("cb").cast(dec) + lit(1).cast(dec)))
      .withColumn("t3t",
        (col("ca") + col("cb")).cast(dec) * (col("ca") + col("cb")).cast(dec)
          * (col("ca") + col("cb")).cast(dec)
          - (col("ca") + col("cb")).cast(dec))
    val agg = terms.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      sum(col("r2a")).as("r2_sum"), sum(col("t3t")).as("tie_sum"))
    agg.select(col("n_a"), col("n_b"),
        (col("r2_sum") - col("n_a").cast(dec) * (col("n_a").cast(dec)
          + lit(1).cast(dec))).as("u2_dec"),
        col("tie_sum"))
      .select(col("n_a"), col("n_b"),
        col("u2_dec").cast("long").as("u2_a"),
        when(col("n_a") > 0 && col("n_b") > 0, {
          val na = col("n_a").cast("double")
          val nb = col("n_b").cast("double")
          val nn = na + nb
          val variance = (na * nb / 12.0) *
            ((nn + 1.0) - col("tie_sum").cast("double")
              / (nn * (nn - 1.0)))
          when(variance > 0d, round(
            (col("u2_dec").cast("double") / 2.0 - na * nb / 2.0)
              / sqrt(variance), 6))
        }).as("z"))
  }

  /** Exact disc-percentile DATA VALUES of a numeric column, computed
    * DISTRIBUTED — the scale-safe replacement for a global
    * `percentile_disc` aggregate, whose implementation buffers the
    * group's distinct values in ONE task's memory (bounded-distinct
    * groups like lag-days are fine; a global percentile over order
    * totals at 100 TB is ~10¹² distinct doubles in one buffer).
    *
    * Shape: collapse to the DISTINCT-VALUE grain (distributed hash
    * agg), then the packOffsets two-phase prefix sum (range partition
    * by value, per-partition totals broadcast back) gives every
    * value's cumulative count; each requested percentile is then ONE
    * conditional-min aggregate — the smallest v with
    * cume_dist(v) ≥ p, the PERCENTILE_DISC definition, decided with
    * EXACT integer arithmetic (cum·den ≥ num·N; p arrives as the
    * rational num/den, never a double product that could round).
    *
    * Returns one row with `outNames` columns, same values a
    * percentile_disc aggregate yields — swap-in without touching the
    * oracle. */
  def distDiscPercentiles(rows: DataFrame, valueCol: String,
      ps: Seq[(Int, Int)], outNames: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.length == outNames.length)
    // NULLs are excluded from N, matching both the replaced
    // percentile_disc aggregate and DuckDB's quantile_disc
    val grain = rows.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val sorted = graft.ops.CacheScope.persist(
      grain.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid"))
      .agg(sum(col("c")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val tot = sorted.agg(sum(col("c")).as("n"))
    val localW = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = sorted.join(broadcast(offs), Seq("__pid"))
      .withColumn("cum", col("__off") + sum(col("c")).over(localW))
      .crossJoin(broadcast(tot))
    val sels = ps.zip(outNames).map { case ((num, den), name) =>
      min(when(col("cum") * den >= col("n") * num, col("v"))).as(name)
    }
    cum.agg(sels.head, sels.tail: _*)
  }

  /** GROUPED [[distDiscPercentiles]] — one row of disc-percentile data
    * values PER GROUP, still without any single-task distinct-value
    * buffer: the grain is (group, value) with counts; the range
    * exchange keys on (group, value) so a group's values stay sorted
    * across partitions; the cross-partition offsets come from a
    * per-(partition, group) totals frame cumulated by a window
    * PARTITIONED BY GROUP over the partition ids (≤ partitions rows
    * per group — never row-grained); each percentile is a
    * conditional-min per group with the exact cum·den ≥ num·N rule.
    *
    * The swap-in for per-group percentile_disc aggregates whose groups
    * are few but whose within-group distinct values are unbounded
    * (order values by status at 100 TB: 3 groups × 10¹² distincts —
    * exactly where the single-task buffer dies). */
  def distDiscPercentilesBy(rows: DataFrame, valueCol: String,
      groupCol: String, ps: Seq[(Int, Int)], outNames: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.length == outNames.length)
    // NULL values excluded from each group's N (percentile_disc parity)
    val grain = rows.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__g"),
        col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val sorted = graft.ops.CacheScope.persist(
      grain.repartitionByRange(col("__g"), col("v"))
        .sortWithinPartitions(col("__g"), col("v"))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.partitionBy("__g").orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid"), col("__g"))
      .agg(sum(col("c")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__g"), col("__off"))
    val tot = sorted.groupBy(col("__g")).agg(sum(col("c")).as("__n"))
    val localW = Window.partitionBy("__pid", "__g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = sorted.join(broadcast(offs), Seq("__pid", "__g"))
      .withColumn("cum", col("__off") + sum(col("c")).over(localW))
      .join(broadcast(tot), Seq("__g"))
    val sels = ps.zip(outNames).map { case ((num, den), name) =>
      min(when(col("cum") * den >= col("__n") * num, col("v"))).as(name)
    }
    cum.groupBy(col("__g").as(groupCol)).agg(sels.head, sels.tail: _*)
  }

  /** Exact empirical CDF at the DISTINCT-VALUE grain, computed
    * DISTRIBUTED — the rank-normalization feature transform (map any
    * value to its cume_dist in [0,1], the monotone scale-free encoding
    * feature pipelines use before models that care about order, not
    * magnitude). A row-grain `cume_dist()` window would sort the whole
    * table in one task; this is the [[distDiscPercentiles]] shape
    * instead: value-grain hash agg, packOffsets two-phase prefix sum
    * (range partition by value, ≤ #partitions offset rows through the
    * bounded window), emitted at the value grain — the lookup table a
    * row-grain transform then joins by value (or broadcast-maps, for
    * bounded supports).
    *
    * Output: one row per distinct non-NULL value — (`valueCol`, n,
    * cume_dist 9-dp). */
  def ecdf(rows: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grain = rows.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val sorted = graft.ops.CacheScope.persist(
      grain.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
        .withColumn("__pid", spark_partition_id()))
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sorted.groupBy(col("__pid"))
      .agg(sum(col("c")).as("__pt"))
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    val tot = sorted.agg(sum(col("c")).as("__n"))
    val localW = Window.partitionBy("__pid").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    sorted.join(broadcast(offs), Seq("__pid"))
      .withColumn("cum", col("__off") + sum(col("c")).over(localW))
      .crossJoin(broadcast(tot))
      .select(col("v").as(valueCol), col("c").as("n"),
        round(col("cum") / col("__n").cast("double"), 9).as("cume_dist"))
  }

  /** DuckDB replay of [[ecdf]] (single-window cumulative — it runs at
    * oracle SF): `fromSql` must yield one column `v`. */
  def ecdfOracleSql(fromSql: String, outName: String): String =
    s"""WITH base AS ($fromSql),
      g AS (SELECT v, count(*) AS c FROM base WHERE v IS NOT NULL
            GROUP BY 1),
      t AS (SELECT sum(c) AS nn FROM g),
      cum AS (
        SELECT v, c, CAST(sum(c) OVER (ORDER BY v
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM g)
      SELECT v AS $outName, CAST(c AS BIGINT) AS n,
        round(cum / CAST(nn AS DOUBLE), 9) AS cume_dist
      FROM cum, t"""

  /** DuckDB replay of [[mannWhitney]] (single-window cumulative — it
    * runs at oracle SF): `fromSql` must yield columns (v, grp). */
  def mannWhitneyOracleSql(fromSql: String, groupA: String,
      groupB: String): String =
    s"""WITH base AS ($fromSql),
      grain AS (
        SELECT v,
          CAST(sum(CASE WHEN grp = '$groupA' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN grp = '$groupB' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM base WHERE grp IN ('$groupA', '$groupB') GROUP BY 1),
      cum AS (
        SELECT ca, cb,
          COALESCE(CAST(sum(ca + cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS BIGINT), 0) AS below
        FROM grain),
      agg AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b,
          sum(CAST(ca AS DECIMAL(38,0)) *
            (2 * CAST(below AS DECIMAL(38,0))
              + CAST(ca AS DECIMAL(38,0)) + CAST(cb AS DECIMAL(38,0))
              + 1)) AS r2_sum,
          sum(CAST(ca + cb AS DECIMAL(38,0))
            * CAST(ca + cb AS DECIMAL(38,0))
            * CAST(ca + cb AS DECIMAL(38,0))
            - CAST(ca + cb AS DECIMAL(38,0))) AS tie_sum
        FROM cum),
      u AS (
        SELECT n_a, n_b,
          r2_sum - CAST(n_a AS DECIMAL(38,0))
            * (CAST(n_a AS DECIMAL(38,0)) + 1) AS u2_dec,
          tie_sum
        FROM agg)
      SELECT n_a, n_b, CAST(u2_dec AS BIGINT) AS u2_a,
        CASE WHEN n_a > 0 AND n_b > 0 AND
          (CAST(n_a AS DOUBLE) * n_b / 12.0) *
            ((CAST(n_a AS DOUBLE) + n_b + 1.0)
              - CAST(tie_sum AS DOUBLE)
                / ((CAST(n_a AS DOUBLE) + n_b)
                  * (CAST(n_a AS DOUBLE) + n_b - 1.0))) > 0
        THEN round(
          (CAST(u2_dec AS DOUBLE) / 2.0
            - CAST(n_a AS DOUBLE) * n_b / 2.0)
          / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0) *
            ((CAST(n_a AS DOUBLE) + n_b + 1.0)
              - CAST(tie_sum AS DOUBLE)
                / ((CAST(n_a AS DOUBLE) + n_b)
                  * (CAST(n_a AS DOUBLE) + n_b - 1.0)))), 6)
        END AS z
      FROM u"""

  /** Jensen–Shannon divergence between two groups' BINNED value
    * distributions — the symmetric, bounded ([0, ln 2]) companion to
    * the PSI (`ext_signal_drift_psi`, which explodes on empty bins)
    * and the exact KS test (`ext_ks_test`, which needs the full
    * distinct-value CDF): JSD is the drift statistic you put on a
    * dashboard because it is finite for ANY pair of histograms.
    *
    *   JSD = ½ Σ p ln(p/m) + ½ Σ q ln(q/m),  m = (p+q)/2,
    *
    * zero-probability bins contribute 0 on their side by convention
    * (the limit x ln x → 0). Emits nats and bits (÷ ln 2, pinned
    * literal) plus the bin count.
    *
    * Determinism: p, q, m are exact integer-count ratios; each ln
    * factor rounds to 6 dp before the product (the mutualInformation
    * rule), per-bin terms round to 9 dp and fold through
    * DECIMAL(38,12).
    *
    * Scale: one hash agg onto the bin grain (cardinality = value
    * range / binWidth, bounded by construction — never row-grained),
    * a 1-row broadcast total, a pure projection, and a 1-row fold.
    * One shuffle end to end. */
  def jsDivergence(rows: DataFrame, valueCol: String, groupCol: String,
      groupA: String, groupB: String, binWidth: Long): DataFrame = {
    val bins = graft.ops.CacheScope.persist(
      rows.filter(col(groupCol).isin(groupA, groupB))
        .groupBy(expr(s"CAST($valueCol AS BIGINT) div $binWidth")
          .as("bin"))
        .agg(
          sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("ca"),
          sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("cb")))
    val tot = bins.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("p", col("ca").cast("double") / col("n_a"))
      .withColumn("q", col("cb").cast("double") / col("n_b"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term", round(
        when(col("p") > 0,
          col("p") * round(log(col("p") / col("m")), 6) / 2)
          .otherwise(0d) +
        when(col("q") > 0,
          col("q") * round(log(col("q") / col("m")), 6) / 2)
          .otherwise(0d), 9))
    terms.agg(
      count(lit(1)).as("n_bins"),
      round(graft.Det.dsumWide(col("term")), 6).as("js_nats"),
      round(graft.Det.dsumWide(col("term")) / Ln2, 6).as("js_bits"))
  }

  /** DuckDB replay of [[jsDivergence]]: `fromSql` must yield columns
    * (v, grp). */
  def jsDivergenceOracleSql(fromSql: String, groupA: String,
      groupB: String, binWidth: Long): String =
    s"""WITH base AS ($fromSql),
      bins AS MATERIALIZED (
        SELECT CAST(v AS BIGINT) // $binWidth AS bin,
          CAST(sum(CASE WHEN grp = '$groupA' THEN 1 ELSE 0 END)
            AS BIGINT) AS ca,
          CAST(sum(CASE WHEN grp = '$groupB' THEN 1 ELSE 0 END)
            AS BIGINT) AS cb
        FROM base WHERE grp IN ('$groupA', '$groupB') GROUP BY 1),
      tot AS (
        SELECT CAST(sum(ca) AS BIGINT) AS n_a,
          CAST(sum(cb) AS BIGINT) AS n_b FROM bins),
      terms AS (
        SELECT round(
          CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / n_a)
            * round(ln((CAST(ca AS DOUBLE) / n_a)
              / ((CAST(ca AS DOUBLE) / n_a
                + CAST(cb AS DOUBLE) / n_b) / 2)), 6) / 2
            ELSE 0 END +
          CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / n_b)
            * round(ln((CAST(cb AS DOUBLE) / n_b)
              / ((CAST(ca AS DOUBLE) / n_a
                + CAST(cb AS DOUBLE) / n_b) / 2)), 6) / 2
            ELSE 0 END, 9) AS term
        FROM bins CROSS JOIN tot)
      SELECT CAST(count(*) AS BIGINT) AS n_bins,
        round(${graft.Det.dsumWideSql("term")}, 6) AS js_nats,
        round(${graft.Det.dsumWideSql("term")} / $Ln2, 6) AS js_bits
      FROM terms"""
}

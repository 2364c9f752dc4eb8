package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular/text featurization for training-data preparation — the
  * encode-before-train stages a large-scale ML pipeline runs over the
  * cleaned corpus: smoothed target encoding for high-cardinality
  * categoricals and the signed hashing trick for unbounded token
  * vocabularies. Both are single-pass hash-aggregate shapes with no
  * windows and no driver-side state, so they hold at any input size;
  * output grain is category (bounded) or (doc × ≤dims) respectively.
  */
object Featurize {

  /** Smoothed target encoding (Micci-Barreca 2001): each category's
    * mean target shrunk toward the global mean by pseudo-count `m` —
    *   enc(c) = (Σ_c target + m·ȳ) / (n_c + m)
    * the standard leakage-resistant encoding for high-cardinality
    * categoricals (rare categories collapse to the prior instead of
    * memorizing their few labels).
    *
    * Scale (100 TB): ONE hash aggregate at category grain (map-side
    * partials shrink each partition to its distinct categories); the
    * global mean re-aggregates the CATEGORY frame — a second pass over
    * tens of thousands of rows, not the input — and joins back as a
    * 1-row broadcast. Target must be 0/1 or any integral column so the
    * per-category sums stay exact integers; the only division happens
    * at the end, in a fixed IEEE order mirrored by the oracle.
    *
    * Output: (`category`, `n`, `raw_rate`, `encoded`), 6-dp doubles. */
  def targetEncode(rows: DataFrame, catCol: String, targetCol: String,
      m: Double = 100.0): DataFrame = {
    val per = graft.ops.CacheScope.persist(
      rows.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as("n"),
          sum(col(targetCol).cast("long")).as("t")))
    val glob = per.agg(sum(col("t")).as("gt"), sum(col("n")).as("gn"))
    per.crossJoin(broadcast(glob))
      .select(col("category"), col("n"),
        round(col("t").cast("double") / col("n"), 6).as("raw_rate"),
        round((col("t") + lit(m) *
          (col("gt").cast("double") / col("gn"))) / (col("n") + lit(m)), 6)
          .as("encoded"))
  }

  /** SQL fragment family for [[targetEncode]]'s oracle: same fixed
    * IEEE tree. `fromSql` must yield columns (category, target). */
  def targetEncodeOracleSql(fromSql: String, m: Double = 100.0): String = {
    val mD = s"CAST($m AS DOUBLE)"
    s"""WITH base AS ($fromSql),
      per AS (
        SELECT category, count(*) AS n,
          CAST(sum(target) AS BIGINT) AS t
        FROM base GROUP BY 1),
      gstats AS (
        SELECT CAST(sum(t) AS BIGINT) AS gt,
          CAST(sum(n) AS BIGINT) AS gn
        FROM per)
      SELECT category, n,
        round(CAST(t AS DOUBLE) / n, 6) AS raw_rate,
        round((t + $mD * (CAST(gt AS DOUBLE) / gn)) / (n + $mD), 6)
          AS encoded
      FROM per CROSS JOIN gstats"""
  }

  /** Signed feature hashing (the hashing trick, Weinberger et al.
    * 2009): tokens map to `dims` buckets by hash, with a second hash
    * bit choosing ±1 so collisions cancel in expectation instead of
    * biasing upward. Emitted SPARSE (long format): one row per
    * (doc, bucket) with a non-zero value — at most `dims` rows per doc
    * regardless of vocabulary size, which is the whole point: the
    * feature space is fixed at plan time while the vocabulary is
    * unbounded.
    *
    * Scale: tokenize + hash is one codegen projection (only the text
    * and id columns are read); the only shuffle is the (doc, bucket)
    * hash aggregate, partially aggregated map-side. Hashes are md5
    * (first 8 hex chars → bucket, 9th hex char parity → sign) so the
    * oracle replays them exactly; no JVM-private hash functions.
    *
    * Output: (`doc_id`, `bucket`, `val`), val ≠ 0. */
  def featureHash(docs: DataFrame, textCol: String, idCol: String,
      dims: Int = 64): DataFrame = {
    val tok = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextStats.tokens(lower(col(textCol)))).as("term"))
    val h = md5(concat(lit("fh:"), col("term")))
    tok.select(col("doc_id"),
        (conv(substring(h, 1, 8), 16, 10).cast("long") % dims)
          .as("bucket"),
        when(conv(substring(h, 9, 1), 16, 10).cast("long") % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy("doc_id", "bucket")
      .agg(sum(col("sgn")).as("val"))
      .filter(col("val") =!= 0)
  }

  /** DuckDB replay of [[featureHash]] — identical md5 bucket/sign
    * derivation over the identical tokenization. */
  def featureHashOracleSql(dims: Int = 64): String = {
    val ws = "' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)"
    s"""WITH tok AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(lower(text), $ws),
            '[ \\t\\n\\x0B\\f\\r]+')) AS term
        FROM documents),
      hashed AS (
        SELECT doc_id,
          ('0x' || substring(md5('fh:' || term), 1, 8))::BIGINT % $dims
            AS bucket,
          CASE WHEN ('0x' || substring(md5('fh:' || term), 9, 1))::BIGINT
            % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM tok)
      SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS val
      FROM hashed GROUP BY 1, 2 HAVING sum(sgn) != 0"""
  }

  /** Weight of Evidence + Information Value per category against a
    * binary target — the credit-scoring-standard categorical diagnostic
    * next to [[targetEncode]] (which produces a model FEATURE; WoE/IV
    * ranks the feature's predictive power):
    *   woe(c) = ln( (good_c/G) / (bad_c/B) ),
    *   IV     = Σ_c (good_c/G − bad_c/B) · woe(c).
    * A category with only goods or only bads has undefined WoE — it
    * emits NULL and contributes 0 to IV (the no-smoothing convention;
    * the spec pins it).
    *
    * Scale: ONE hash aggregate at category grain; G/B re-aggregate the
    * category frame (1-row broadcast back). Distribution ratios are
    * exact integer-count divisions, the ln factor rounds 6 dp before
    * the product (the mutualInformation rule), IV terms round 9 dp and
    * fold through DECIMAL(38,12).
    *
    * Output: (category, n, bad, good, dist_good, dist_bad, woe, iv) —
    * iv repeated on every row (the Benford chi-square readout shape). */
  def woeIv(rows: DataFrame, catCol: String, targetCol: String)
      : DataFrame = {
    val per = graft.ops.CacheScope.persist(
      rows.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as("n"),
          sum(col(targetCol).cast("long")).as("bad"))
        .withColumn("good", col("n") - col("bad")))
    val glob = per.agg(sum(col("good")).as("gg"), sum(col("bad")).as("gb"))
    val scored = graft.ops.CacheScope.persist(
      per.crossJoin(broadcast(glob))
        .withColumn("dist_good",
          round(col("good").cast("double") / col("gg"), 6))
        .withColumn("dist_bad",
          round(col("bad").cast("double") / col("gb"), 6))
        .withColumn("woe",
          when(col("good") > 0 && col("bad") > 0,
            round(log((col("good").cast("double") / col("gg"))
              / (col("bad").cast("double") / col("gb"))), 6)))
        .withColumn("term", round(
          when(col("woe").isNotNull,
            ((col("good").cast("double") / col("gg"))
              - (col("bad").cast("double") / col("gb"))) * col("woe"))
            .otherwise(0d), 9)))
    val iv = scored.agg(round(graft.Det.dsumWide(col("term")), 6).as("iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("category"), col("n"), col("bad"), col("good"),
        col("dist_good"), col("dist_bad"), col("woe"), col("iv"))
  }

  /** DuckDB replay of [[woeIv]]: `fromSql` must yield columns
    * (category, target). */
  def woeIvOracleSql(fromSql: String): String =
    s"""WITH base AS ($fromSql),
      per AS MATERIALIZED (
        SELECT category, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(target) AS BIGINT) AS bad,
          CAST(count(*) - sum(target) AS BIGINT) AS good
        FROM base GROUP BY 1),
      gstats AS (
        SELECT CAST(sum(good) AS BIGINT) AS gg,
          CAST(sum(bad) AS BIGINT) AS gb FROM per),
      scored AS MATERIALIZED (
        SELECT category, n, bad, good,
          round(CAST(good AS DOUBLE) / gg, 6) AS dist_good,
          round(CAST(bad AS DOUBLE) / gb, 6) AS dist_bad,
          CASE WHEN good > 0 AND bad > 0 THEN
            round(ln((CAST(good AS DOUBLE) / gg)
              / (CAST(bad AS DOUBLE) / gb)), 6) END AS woe,
          round(CASE WHEN good > 0 AND bad > 0 THEN
            ((CAST(good AS DOUBLE) / gg) - (CAST(bad AS DOUBLE) / gb))
              * round(ln((CAST(good AS DOUBLE) / gg)
                / (CAST(bad AS DOUBLE) / gb)), 6)
            ELSE 0 END, 9) AS term
        FROM per CROSS JOIN gstats),
      iv AS (SELECT round(${graft.Det.dsumWideSql("term")}, 6) AS iv
        FROM scored)
      SELECT category, n, bad, good, dist_good, dist_bad, woe, iv
      FROM scored CROSS JOIN iv"""

  /** Equi-depth (quantile) binning of a numeric column — the feature
    * discretization every scorecard/GBM preprocessing pipeline runs,
    * the depth-balanced companion to the equi-WIDTH
    * `ext_length_histogram`: bin edges are the 1/nBins..(nBins−1)/nBins
    * DISC-percentile DATA VALUES (no interpolation arithmetic — the
    * bootstrap-CI rule), and each row's bin is 1 + the count of edges
    * strictly below it (ties share a bin, so heavy ties legitimately
    * unbalance depth — the spec pins the property on distinct-ish
    * data).
    *
    * Scale: the edge frame is ONE aggregate row broadcast back; bin
    * assignment is a pure projection; the readout is a hash agg onto
    * ≤nBins keys.
    *
    * Output: (bin, n, lo, hi, avg_v), 6-dp stats per bin. */
  def quantileBins(rows: DataFrame, valueCol: String, nBins: Int = 10)
      : DataFrame = {
    val v = rows.select(col(valueCol).cast("double").as("v"))
    // edges via the DISTRIBUTED disc-percentile (a global
    // percentile_disc aggregate buffers every distinct value in one
    // task — Stats.distDiscPercentiles carries the rationale); same
    // values, so the quantile_disc oracle is untouched
    val edges = Stats.distDiscPercentiles(v, "v",
      (1 until nBins).map(i => (i, nBins)),
      (1 until nBins).map(i => s"e$i"))
    val binned = v.crossJoin(broadcast(edges))
      .select(col("v"),
        (1 until nBins).map(i =>
          when(col("v") > col(s"e$i"), 1).otherwise(0))
          .reduce(_ + _).cast("int").as("b"))
    binned.groupBy((col("b") + 1).as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("v")), 6).as("lo"),
        round(max(col("v")), 6).as("hi"),
        round(graft.Det.dsum(col("v"), 2) / count(lit(1)), 6).as("avg_v"))
  }

  /** DuckDB replay of [[quantileBins]]: `fromSql` must yield column v. */
  def quantileBinsOracleSql(fromSql: String, nBins: Int = 10): String = {
    val edgeSel = (1 until nBins).map(i =>
      s"quantile_disc(v, ${i.toDouble / nBins}) AS e$i").mkString(", ")
    val binExpr = (1 until nBins).map(i =>
      s"CASE WHEN v > e$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH base AS ($fromSql),
      edges AS (SELECT $edgeSel FROM base),
      binned AS (
        SELECT v, CAST($binExpr AS INT) AS b
        FROM base CROSS JOIN edges)
      SELECT CAST(b + 1 AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
        round(min(v), 6) AS lo, round(max(v), 6) AS hi,
        round(${graft.Det.dsumSql("v", 2)} / count(*), 6) AS avg_v
      FROM binned GROUP BY 1"""
  }
}

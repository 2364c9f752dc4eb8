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
}

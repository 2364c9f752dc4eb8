package graft

import org.apache.spark.sql.functions._

import graft.ext.{UnigramLm, Vocab}
import graft.ExtQueries.wsTrimSql

/** Registered queries for the unigram-LM tokenizer family
  * ([[graft.ext.UnigramLm]], r12 VERDICT #6). The oracles replay the
  * ENTIRE trainer in DuckDB SQL — seed substring counts, two hard-EM
  * Viterbi passes, the count prune, and the final segmentation — with
  * the Viterbi DP unrolled over the fixture's ≤ 12 word positions as
  * chained CTEs (the `ext_bpe_merges` unrolled-loop precedent; the
  * fixture bound is what makes the DP finitely unrollable, while the
  * Spark side handles any length through the same bounded fold).
  * Every per-position CTE is MATERIALIZED: each is referenced by up to
  * `maxPieceLen` later positions plus the backtrace, and DuckDB
  * inlines CTEs by default — 12 chained positions would otherwise
  * re-evaluate exponentially (the components-loop lesson, SQL side). */
object UnigramQueries {

  private val MaxW = UnigramLm.MaxWordLen  // 12: DP unroll depth
  private val MaxP = UnigramLm.MaxPieceLen // 4: branches per position

  /** One Viterbi pass as SQL: forward DP (`<pfx>d0..d12`), position
    * lookup table (`<pfx>da`), backtrace (`<pfx>b0..b12`), emitted
    * pieces (`<pfx>p`), and weighted usage counts (`<pfx>n`).
    * `wordsCte` must expose (wid, c); `vocabCte` (piece, cost). The
    * tie rule — min cost, then LONGEST piece — is the row_number
    * (cost ASC, l DESC) twin of the Scala fold's `cand <= best` over
    * ascending l. */
  private def uniPassSql(pfx: String, wordsCte: String,
      vocabCte: String): String = {
    val dp0 = s"${pfx}d0 AS (SELECT wid, c, 0.0 AS cost, 0 AS l " +
      s"FROM $wordsCte)"
    val dps = (1 to MaxW).map { j =>
      val branches = (1 to math.min(MaxP, j)).map { l =>
        s"""SELECT p.wid, p.c, p.cost + coalesce(v.cost, 1e9) AS cost,
        $l AS l
      FROM ${pfx}d${j - l} p LEFT JOIN $vocabCte v
        ON v.piece = substr(p.wid, ${j - l + 1}, $l)
      WHERE length(p.wid) >= $j"""
      }.mkString("\n      UNION ALL\n      ")
      s"""${pfx}d$j AS MATERIALIZED (
    SELECT wid, c, cost, l FROM (
      SELECT wid, c, cost, l,
        row_number() OVER (PARTITION BY wid ORDER BY cost ASC, l DESC)
          AS rn
      FROM ($branches)) WHERE rn = 1)"""
    }
    val dpall = s"""${pfx}da AS MATERIALIZED (
    ${(1 to MaxW).map(j => s"SELECT wid, $j AS pos, l FROM ${pfx}d$j")
      .mkString("\n    UNION ALL ")})"""
    val bt0 =
      s"${pfx}b0 AS (SELECT wid, c, length(wid) AS pos FROM $wordsCte)"
    val bts = (1 to MaxW).map { k =>
      s"""${pfx}b$k AS MATERIALIZED (
    SELECT b.wid, b.c, substr(b.wid, b.pos - d.l + 1, d.l) AS piece,
      b.pos - d.l AS pos, $k AS kk
    FROM ${pfx}b${k - 1} b JOIN ${pfx}da d
      ON d.wid = b.wid AND d.pos = b.pos
    WHERE b.pos > 0)"""
    }
    val pieces = s"""${pfx}p AS MATERIALIZED (
    ${(1 to MaxW).map(k => s"SELECT wid, c, piece, kk FROM ${pfx}b$k")
      .mkString("\n    UNION ALL ")})"""
    val counts = s"${pfx}n AS MATERIALIZED " +
      s"(SELECT piece, sum(c) AS n FROM ${pfx}p GROUP BY 1)"
    (Seq(dp0) ++ dps ++ Seq(dpall, bt0) ++ bts ++ Seq(pieces, counts))
      .mkString(",\n  ")
  }

  /** The trainer chain through the final pruned model (`uv2`/`uvc2`):
    * corpus word counts, the 50-word fixture, substring seed, seed
    * costs, EM pass 1 (+1-smoothed re-estimate over the full seed),
    * EM pass 2 (raw counts), the char-preserving count prune, and the
    * pruned model's +1-smoothed costs. Shared verbatim by all four
    * oracles — the one-definition oracle-drift rule. */
  private def uniCoreSql: String =
    s"""allw AS MATERIALIZED (
    SELECT tok, count(*) AS c FROM (
      SELECT unnest(string_split_regex(${wsTrimSql("lower(text)")},
        '[ \\t\\n\\x0B\\f\\r]+')) AS tok
      FROM documents) GROUP BY 1),
  uws AS MATERIALIZED (
    SELECT tok AS wid, c FROM allw
    WHERE length(tok) BETWEEN 1 AND $MaxW
    ORDER BY c DESC, tok ASC LIMIT 50),
  usubs AS MATERIALIZED (
    SELECT substr(wid, st, l) AS piece, sum(c) AS n0
    FROM uws,
      unnest(generate_series(1, length(wid))) AS s(st),
      unnest(generate_series(1, $MaxP)) AS q(l)
    WHERE st + l - 1 <= length(wid)
    GROUP BY 1),
  uv0 AS MATERIALIZED (
    SELECT piece, n0 FROM usubs WHERE length(piece) = 1
    UNION ALL
    SELECT piece, n0 FROM (
      SELECT piece, n0 FROM usubs WHERE length(piece) >= 2
      ORDER BY n0 * length(piece) DESC, piece ASC LIMIT 40)),
  uvc0 AS MATERIALIZED (
    SELECT piece, round(-ln(CAST(n0 AS DOUBLE) /
      (SELECT CAST(sum(n0) AS DOUBLE) FROM uv0)), 6) AS cost
    FROM uv0),
  ${uniPassSql("s1", "uws", "uvc0")},
  un1 AS (SELECT uv0.piece, coalesce(s1n.n, 0) + 1 AS ne
    FROM uv0 LEFT JOIN s1n USING (piece)),
  uvc1 AS MATERIALIZED (
    SELECT piece, round(-ln(CAST(ne AS DOUBLE) /
      (SELECT CAST(sum(ne) AS DOUBLE) FROM un1)), 6) AS cost
    FROM un1),
  ${uniPassSql("s2", "uws", "uvc1")},
  uv2 AS MATERIALIZED (
    SELECT uv0.piece, coalesce(s2n.n, 0) AS n2
    FROM uv0 LEFT JOIN s2n USING (piece) WHERE length(uv0.piece) = 1
    UNION ALL
    SELECT piece, n2 FROM (
      SELECT uv0.piece AS piece, coalesce(s2n.n, 0) AS n2
      FROM uv0 LEFT JOIN s2n USING (piece) WHERE length(uv0.piece) >= 2
      ORDER BY n2 DESC, piece ASC LIMIT 25)),
  un2 AS (SELECT piece, n2 + 1 AS ne FROM uv2),
  uvc2 AS MATERIALIZED (
    SELECT piece, round(-ln(CAST(ne AS DOUBLE) /
      (SELECT CAST(sum(ne) AS DOUBLE) FROM un2)), 6) AS cost
    FROM un2)"""

  /** The coverage domain: corpus words within the fixture length bound
    * whose every character is in the pruned model's alphabet. */
  private def uniEligSql: String =
    s"""v2ch AS (SELECT piece FROM uv2 WHERE length(piece) = 1),
  wch AS (
    SELECT w.tok, w.c,
      min(CASE WHEN substr(w.tok, u.j, 1) IN (SELECT piece FROM v2ch)
          THEN 1 ELSE 0 END) AS allok
    FROM allw w, unnest(generate_series(1, length(w.tok))) AS u(j)
    WHERE length(w.tok) BETWEEN 1 AND $MaxW
    GROUP BY w.tok, w.c),
  elig AS (SELECT tok, c FROM wch WHERE allok = 1)"""

  /** Final pruned vocabulary with per-piece usage in the final
    * segmentation pass and the model cost parameter. */
  val unigramVocab = Q(
    "ext_unigram_lm_vocab",
    (s, d) => {
      import s.implicits._
      UnigramLm.train(Tables.documents(s, d), "text").vocab
        .toDF("piece", "is_char", "n_seg", "cost")
    },
    Some(s"""WITH $uniCoreSql,
  ${uniPassSql("s3", "uws", "uvc2")}
  SELECT v.piece AS piece,
    CAST(CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END AS INT)
      AS is_char,
    CAST(coalesce(n.n, 0) AS BIGINT) AS n_seg,
    c.cost AS cost
  FROM uv2 v JOIN uvc2 c USING (piece) LEFT JOIN s3n n USING (piece)"""))

  /** Viterbi segmentation of the fixture words under the final model:
    * (word, 1-based piece ordinal, piece). */
  val unigramSegment = Q(
    "ext_unigram_segment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = UnigramLm.train(docs, "text")
      UnigramLm.fixtureWords(docs, "text", 50)
        .select(col("tok").as("wid"),
          posexplode(UnigramLm.viterbiPieces(col("tok"), model.costs))
            .as(Seq("p0", "piece")))
        .select(col("wid"), (col("p0") + 1).cast("int").as("ord"),
          col("piece"))
    },
    Some(s"""WITH $uniCoreSql,
  ${uniPassSql("s3", "uws", "uvc2")}
  SELECT wid,
    CAST(row_number() OVER (PARTITION BY wid ORDER BY kk DESC) AS INT)
      AS ord,
    piece
  FROM s3p"""))

  /** Corpus coverage of the pruned model: token- and type-weighted
    * share of words the model segments without the UNK escape. */
  val unigramCoverage = Q(
    "ext_unigram_coverage",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = UnigramLm.train(docs, "text")
      val eligFlag = length(col("tok")).between(1, MaxW) &&
        forall(split(col("tok"), ""),
          ch => array_contains(typedLit(model.chars), ch))
      Vocab.wordCounts(docs, "text")
        .filter(length(col("tok")) >= 1)
        .select(col("c"), eligFlag.as("e"))
        .agg(sum(col("c")).as("n_tokens_total"),
          sum(when(col("e"), col("c")).otherwise(0L))
            .as("n_tokens_covered"),
          count(lit(1)).as("n_types_total"),
          sum(col("e").cast("long")).as("n_types_covered"))
        .select(col("n_tokens_total"), col("n_tokens_covered"),
          round(col("n_tokens_covered").cast("double") /
            col("n_tokens_total").cast("double"), 6).as("coverage"),
          col("n_types_total"), col("n_types_covered"))
    },
    Some(s"""WITH $uniCoreSql,
  $uniEligSql
  SELECT CAST(t.nt AS BIGINT) AS n_tokens_total,
    CAST(coalesce(e.nc, 0) AS BIGINT) AS n_tokens_covered,
    round(CAST(coalesce(e.nc, 0) AS DOUBLE) / CAST(t.nt AS DOUBLE), 6)
      AS coverage,
    CAST(t.kt AS BIGINT) AS n_types_total,
    CAST(coalesce(e.kc, 0) AS BIGINT) AS n_types_covered
  FROM (SELECT sum(c) AS nt, count(*) AS kt FROM allw
        WHERE length(tok) >= 1) t,
       (SELECT sum(c) AS nc, count(*) AS kc FROM elig) e"""))

  /** Tokenizer fertility over the covered corpus words: weighted
    * pieces per token under the final model — the oracle re-runs the
    * Viterbi DP over the WHOLE eligible word set (vocabulary-sized;
    * the fixture bound keeps the unroll finite). */
  val unigramFertility = Q(
    "ext_unigram_fertility",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = UnigramLm.train(docs, "text")
      UnigramLm.eligibleWords(docs, "text", model.chars)
        .select(col("c"),
          size(UnigramLm.viterbiPieces(col("tok"), model.costs))
            .cast("long").as("np"))
        .agg(sum(col("c")).as("total_tokens"),
          sum(col("c") * col("np")).as("total_pieces"))
        .select(col("total_tokens"), col("total_pieces"),
          round(col("total_pieces").cast("double") /
            col("total_tokens").cast("double"), 6).as("fertility"))
    },
    Some(s"""WITH $uniCoreSql,
  $uniEligSql,
  eligw AS MATERIALIZED (SELECT tok AS wid, c FROM elig),
  ${uniPassSql("f", "eligw", "uvc2")}
  SELECT CAST(t.tt AS BIGINT) AS total_tokens,
    CAST(p.tp AS BIGINT) AS total_pieces,
    round(CAST(p.tp AS DOUBLE) / CAST(t.tt AS DOUBLE), 6) AS fertility
  FROM (SELECT sum(c) AS tt FROM eligw) t,
       (SELECT sum(c) AS tp FROM fp) p"""))

  def all: Seq[Q] = Seq(
    unigramVocab, unigramSegment, unigramCoverage, unigramFertility)
}

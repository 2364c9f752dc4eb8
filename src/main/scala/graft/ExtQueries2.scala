package graft

import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextDedup, TextStats, Vocab}

/** Second extension-query block (the first grew to its navigable limit):
  * corpus collocation statistics, frequency-spectrum health, semantic
  * decontamination, and streaming dedup. Same contract as [[ExtQueries]]:
  * every entry carries its own DuckDB oracle and a 100 TB scale rationale
  * on the implementing operator.
  */
object ExtQueries2 {

  /** Windowed PMI collocations ([[graft.ext.Vocab.pmiCooccur]], window 2,
    * min pair count 5): the association statistic behind phrase/collocation
    * induction. Pair generation is a pure per-doc projection (offset
    * zip_with slices — no self-join); the oracle replays it as a position
    * self-join, which is the SAME pair set by construction. */
  val pmiCooccur = Q(
    "ext_pmi_cooccur",
    (s, d) => Vocab.pmiCooccur(
      Tables.documents(s, d), "text", window = 2, minCount = 5L),
    Some(s"""WITH toks AS (
        SELECT doc_id,
          string_split_regex(${ExtQueries.wsTrimSql("lower(text)")}, '[ \\t\\n\\x0B\\f\\r]+')
            AS tk
        FROM documents),
      pos AS (
        SELECT doc_id, unnest(tk) AS tok,
          generate_subscripts(tk, 1) AS p
        FROM toks),
      pairs AS (
        SELECT p1.tok AS a, p2.tok AS b
        FROM pos p1 JOIN pos p2
          ON p1.doc_id = p2.doc_id AND p2.p - p1.p BETWEEN 1 AND 2),
      cab AS (SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b),
      pt AS (
        SELECT sum(greatest(len(tk) - 1, 0) + greatest(len(tk) - 2, 0))
          AS p_total
        FROM toks),
      uni AS (SELECT tok, count(*) AS c FROM pos GROUP BY tok),
      tt AS (SELECT sum(c) AS t_total FROM uni)
      SELECT a, b, c_ab,
        round(ln((CAST(c_ab AS DOUBLE) / CAST(p_total AS DOUBLE))
          / ((CAST(ua.c AS DOUBLE) / CAST(t_total AS DOUBLE))
             * (CAST(ub.c AS DOUBLE) / CAST(t_total AS DOUBLE)))), 6) AS pmi
      FROM cab JOIN uni ua ON ua.tok = cab.a
        JOIN uni ub ON ub.tok = cab.b, pt, tt
      WHERE c_ab >= 5"""))

  /** Zipf-law fit ([[graft.ext.Vocab.zipfFit]], top 1000 terms): the
    * frequency-spectrum slope as a corpus-health scalar. */
  val zipfFit = Q(
    "ext_zipf_fit",
    (s, d) => Vocab.zipfFit(Tables.documents(s, d), "text", topN = 1000),
    Some {
      import Det.{dsumWideSql, Ols}
      s"""WITH wc AS (
        SELECT tok, count(*) AS c FROM (
          SELECT unnest(
            string_split_regex(${ExtQueries.wsTrimSql("lower(text)")},
              '[ \\t\\n\\x0B\\f\\r]+')) AS tok
          FROM documents)
        GROUP BY tok),
      top AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rank
        FROM wc ORDER BY c DESC, tok ASC LIMIT 1000),
      xy AS (
        SELECT round(ln(CAST(rank AS DOUBLE)), 6) AS x,
          round(ln(CAST(c AS DOUBLE)), 6) AS y
        FROM top),
      w AS (
        SELECT count(*) AS n_terms,
          ${dsumWideSql("x")} AS sx, ${dsumWideSql("y")} AS sy,
          ${dsumWideSql("x * y")} AS sxy, ${dsumWideSql("x * x")} AS sxx,
          ${dsumWideSql("y * y")} AS syy
        FROM xy)
      SELECT n_terms,
        ${Ols.slopeSql("n_terms", "sx", "sy", "sxy", "sxx")} AS zipf_slope,
        ${Ols.interceptSql("n_terms", "sx", "sy", "sxy", "sxx")}
          AS intercept,
        ${Ols.r2Sql("n_terms", "sx", "sy", "sxy", "sxx", "syy")} AS r2
      FROM w"""
    })

  /** Embedding-level eval contamination
    * ([[graft.ext.Similarity.semanticContamination]]): corpus vectors
    * (vec_id % 10 != 0) within cosine 0.15 of any eval vector
    * (vec_id % 10 = 0), best match per corpus vector. Candidates from
    * 4-bit sign buckets; the oracle replays the identical bucket join so
    * the approximation is oracle-checked (the LSH/IVF contract). */
  val contaminationSemantic = Q(
    "ext_contamination_semantic",
    (s, d) => Similarity.semanticContamination(
      Tables.embeddings(s, d), col("vec_id") % 10 === 0,
      threshold = 0.15, bits = 4),
    Some {
      val bucket = (1 to 4).map(i =>
        s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH b0 AS (
        SELECT vec_id,
          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
          $bucket AS bucket
        FROM embeddings),
      ev AS (
        SELECT vec_id AS eval_id, emb AS b_emb, bucket
        FROM b0 WHERE vec_id % 10 = 0),
      co AS (
        SELECT vec_id AS corpus_id, emb AS a_emb, bucket
        FROM b0 WHERE vec_id % 10 <> 0),
      scored AS (
        SELECT corpus_id, eval_id, ${ExtQueries.dkCos} AS cos
        FROM co JOIN ev USING (bucket)),
      hits AS (SELECT * FROM scored WHERE cos >= 0.15),
      ranked AS (
        SELECT corpus_id, eval_id, cos,
          row_number() OVER (PARTITION BY corpus_id
            ORDER BY cos DESC, eval_id ASC) AS r
        FROM hits)
      SELECT corpus_id, eval_id, cos FROM ranked WHERE r = 1"""
    })

  /** Streaming exactly-once dedup of an at-least-once feed
    * ([[graft.streaming.StreamPipeline.dedupStreamAvailableNow]]): the
    * doubled-source stream must dedup back to the source table
    * row-for-row, which is exactly what the oracle (a plain projection of
    * events) asserts hash-exactly. */
  val streamDedup = Q(
    "q_stream_dedup_events",
    (s, d) => graft.streaming.StreamPipeline.dedupStreamAvailableNow(s, d),
    Some("""SELECT event_id,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
        user_id, event_type, value
      FROM events"""))

  /** HyperLogLog distinct sketch ([[graft.functions.HllAgg]], p=8 →
    * 256 registers) next to the exact count it approximates: per source,
    * estimate distinct texts from the register array. Reproducible
    * across engines by construction — the oracle recomputes the SAME
    * md5-derived registers and the SAME α·m²/Σ2^(−M) estimator (every
    * term an exact power of two, so the sum is order-independent), so
    * even the approximation hash-matches. The KMV companion
    * (`ext_kmv_distinct`) keeps the k smallest hashes; HLL keeps a
    * CONSTANT 256-byte mergeable buffer — the shard-manifest sketch. */
  val hllDistinct = Q(
    "ext_hll_distinct",
    (s, d) => {
      val p = 8
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          graft.functions.HllAgg.hll_sketch(
            TextDedup.baseHash(col("text")), p).as("sk"),
          countDistinct(col("text")).as("exact_distinct"))
        .select(col("source"),
          graft.ops.IncrementalAgg.hllEstimate(col("sk"), p)
            .as("hll_distinct"),
          col("exact_distinct"))
    },
    Some {
      s"""WITH h AS (
        SELECT DISTINCT source,
          ('0x' || substring(md5(text), 1, 8))::BIGINT AS hv
        FROM documents),
      reg AS (
        SELECT source, hv // 16777216 AS reg, hv % 16777216 AS w
        FROM h),
      mx AS (
        SELECT source, reg,
          max(CASE WHEN w = 0 THEN 25
              ELSE 25 - length(ltrim(bin(w), '0')) END) AS mj
        FROM reg GROUP BY source, reg),
      est AS (
        SELECT source,
          sum(pow(2.0, -mj)) + (256 - count(*)) * 1.0 AS s,
          256 - count(*) AS v
        FROM mx GROUP BY source),
      x AS (
        SELECT source, count(DISTINCT text) AS exact_distinct
        FROM documents GROUP BY source)
      SELECT e.source,
        ${graft.ops.IncrementalAgg.hllEstimateSql("s", "v", 8)}
          AS hll_distinct,
        x.exact_distinct
      FROM est e JOIN x USING (source)"""
    })

  /** Per-dimension embedding health profile: mean / variance /
    * zero-fraction / extremes for each of the 64 coordinates — the
    * diagnostic that catches collapsed dimensions (var ≈ 0), dead ReLU
    * coordinates (zero_frac ≈ 1), and scale drift between checkpoints,
    * none of which corpus-level norm stats can localize.
    *
    * Scale: ONE pass — posexplode to (dim, v) then a hash aggregate on
    * the DIMENSION key (64 groups; the shuffle carries 64 rows of
    * aggregate state per map task, map-side combined). Determinism:
    * float→double is exact, v·v is one IEEE product, sums run in exact
    * DECIMAL(38,12), and mean/var evaluate on the resulting doubles with
    * oracle-identical parenthesization, 6-dp rounded. */
  val embDimStats = Q(
    "ext_emb_dim_stats",
    (s, d) => {
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"), col("v").cast("double").as("v"))
        .groupBy(col("dim"))
        .agg(
          count(lit(1)).as("n"),
          Det.dsumWide(col("v")).as("sx"),
          Det.dsumWide(col("v") * col("v")).as("sxx"),
          sum((col("v") === 0.0).cast("long")).as("n_zero"),
          min(col("v")).as("v_min"),
          max(col("v")).as("v_max"))
        .select(col("dim"),
          round(col("sx") / col("n"), 6).as("mean"),
          round((col("sxx") - col("sx") * col("sx") / col("n")) / col("n"),
            6).as("variance"),
          round(col("n_zero").cast("double") / col("n"), 6).as("zero_frac"),
          col("v_min"), col("v_max"))
    },
    Some(s"""WITH x AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS dim,
          CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      w AS (
        SELECT dim, count(*) AS n,
          ${Det.dsumWideSql("v")} AS sx,
          ${Det.dsumWideSql("v * v")} AS sxx,
          sum(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS n_zero,
          min(v) AS v_min, max(v) AS v_max
        FROM x GROUP BY dim)
      SELECT dim, round(sx / n, 6) AS mean,
        round((sxx - sx * sx / n) / n, 6) AS variance,
        round(CAST(n_zero AS DOUBLE) / n, 6) AS zero_frac,
        v_min, v_max
      FROM w"""))

  /** Custom-state streaming sessionization, end-to-end
    * ([[graft.streaming.StreamPipeline.sessionsStateAvailableNow]]):
    * the flatMapGroupsWithState path emits a session only when the
    * event-time watermark passes `last_event + gap` — the oracle replays
    * the batch session islands AND that finality cutoff (final watermark
    * = floor(max_ts_us/1000) − 2h, all integer arithmetic), so streaming
    * event-time semantics are hash-gated rather than spec-only. */
  val streamSessionsState = Q(
    "q_stream_sessions_state",
    (s, d) => graft.streaming.StreamPipeline.sessionsStateAvailableNow(s, d),
    Some(s"""WITH wm AS (
        SELECT (epoch_us(max(ts)) // 1000) - 7200000 AS wm_ms FROM events),
      g AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 14400000000
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, event_id, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS seq
        FROM g),
      s2 AS (
        SELECT user_id, seq, min(ts) AS start_ts, max(ts) AS end_ts,
          count(*) AS n_events,
          ${Det.dsumSql("value")} AS total_value
        FROM sess GROUP BY user_id, seq)
      SELECT user_id,
        strftime(start_ts, '%Y-%m-%d %H:%M:%S') AS session_start,
        strftime(end_ts + INTERVAL 4 HOUR, '%Y-%m-%d %H:%M:%S')
          AS session_end,
        n_events, total_value
      FROM s2, wm
      -- a session is FINAL only once the watermark passes last + gap —
      -- successor closure alone must not emit (an out-of-order but
      -- above-watermark event could still merge into it), so the
      -- streamed output is exactly the watermark-finalized subset
      WHERE (epoch_us(end_ts) + 14400000000) // 1000 < wm_ms"""))

  /** Epoch-incremental distinct counting via HLL sketch MERGE — the
    * materialized-rollup story ([[graft.ops.IncrementalAgg]]) applied to
    * a sketch: per-epoch sketches are data (256-int arrays, persistable
    * in a manifest), and the union estimate comes from merging REGISTERS
    * (posexplode → max per register → reassemble), never rescanning
    * epochs. Day N's corpus-wide distinct count = merge(stored sketches,
    * today's) at register cost. The oracle replays per-epoch registers,
    * the max-merge, and both estimates; exact counts ride along as the
    * accuracy reference. */
  val hllMergeEpochs = Q(
    "ext_hll_merge_epochs",
    (s, d) => {
      val p = 8
      val docs = Tables.documents(s, d)
      val withEpoch = docs.withColumn("epoch", (col("doc_id") % 2).cast("int"))
      val sketches = graft.ops.CacheScope.persist(
        withEpoch.groupBy(col("epoch"))
          .agg(graft.functions.HllAgg.hll_sketch(
            TextDedup.baseHash(col("text")), p).as("sk"),
            countDistinct(col("text")).as("exact_distinct")))
      val perEpoch = sketches.select(
        concat(lit("epoch_"), col("epoch")).as("scope"),
        graft.ops.IncrementalAgg.hllEstimate(col("sk"), p)
          .as("hll_distinct"),
        col("exact_distinct"))
      val mergedSk = sketches
        .select(posexplode(col("sk")).as(Seq("reg", "m")))
        .groupBy(col("reg")).agg(max(col("m")).as("m"))
        .agg(transform(
          array_sort(collect_list(struct(col("reg"), col("m")))),
          x => x.getField("m")).as("sk"))
      val unionExact = docs.agg(countDistinct(col("text")).as("exact_distinct"))
      val unionRow = mergedSk.crossJoin(unionExact)
        .select(lit("union").as("scope"),
          graft.ops.IncrementalAgg.hllEstimate(col("sk"), p)
            .as("hll_distinct"),
          col("exact_distinct"))
      perEpoch.unionAll(unionRow)
    },
    Some {
      def est(s: String, v: String) =
        graft.ops.IncrementalAgg.hllEstimateSql(s, v, 8)
      s"""WITH hv AS (
        SELECT DISTINCT doc_id % 2 AS epoch,
          ('0x' || substring(md5(text), 1, 8))::BIGINT AS hv
        FROM documents),
      reg AS (
        SELECT epoch, hv // 16777216 AS reg, hv % 16777216 AS w FROM hv),
      mx AS (
        SELECT epoch, reg,
          max(CASE WHEN w = 0 THEN 25
              ELSE 25 - length(ltrim(bin(w), '0')) END) AS mj
        FROM reg GROUP BY epoch, reg),
      est_e AS (
        SELECT epoch, sum(pow(2.0, -mj)) + (256 - count(*)) * 1.0 AS s,
          256 - count(*) AS v
        FROM mx GROUP BY epoch),
      xm AS (SELECT reg, max(mj) AS mj FROM mx GROUP BY reg),
      est_u AS (
        SELECT sum(pow(2.0, -mj)) + (256 - count(*)) * 1.0 AS s,
          256 - count(*) AS v
        FROM xm),
      ex_e AS (
        SELECT doc_id % 2 AS epoch, count(DISTINCT text) AS exact_distinct
        FROM documents GROUP BY doc_id % 2),
      ex_u AS (SELECT count(DISTINCT text) AS exact_distinct FROM documents)
      SELECT 'epoch_' || e.epoch AS scope,
        ${est("e.s", "e.v")} AS hll_distinct, x.exact_distinct
      FROM est_e e JOIN ex_e x USING (epoch)
      UNION ALL
      SELECT 'union', ${est("s", "v")}, exact_distinct
      FROM est_u, ex_u"""
    })

  /** Content-type routing ([[graft.ext.TextStats.contentType]]): code /
    * math / prose labels from character and line evidence in one
    * shuffle-free projection pass — the curation stage that routes code
    * to a code pipeline and math to a math-aware tokenizer before the
    * prose filters run. */
  val contentType = Q(
    "ext_content_type",
    (s, d) => TextStats.contentType(Tables.documents(s, d), "text", "doc_id"),
    Some("""SELECT doc_id,
        round(len(regexp_extract_all(text, '[{}()\[\];=]'))
          / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS brace_ratio,
        round(CAST(len(list_filter(string_split(text, chr(10)),
            l -> regexp_matches(l, '^( |\t)'))) AS DOUBLE)
          / CAST(greatest(len(string_split(text, chr(10))), 1) AS DOUBLE),
          6) AS indent_frac,
        round(len(regexp_extract_all(text, '[=+*/^<>|~-]'))
          / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS math_ratio,
        CASE WHEN round(len(regexp_extract_all(text, '[{}()\[\];=]'))
               / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) > 0.02
              AND round(CAST(len(list_filter(string_split(text, chr(10)),
                  l -> regexp_matches(l, '^( |\t)'))) AS DOUBLE)
                / CAST(greatest(len(string_split(text, chr(10))), 1)
                  AS DOUBLE), 6) > 0.1
             THEN 'code'
             WHEN round(len(regexp_extract_all(text, '[=+*/^<>|~-]'))
               / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) > 0.05
             THEN 'math'
             ELSE 'prose' END AS content_label
      FROM documents"""))

  /** CLIP-style cross-modal alignment gate
    * ([[graft.ext.Multimodal.clipAlignmentGate]]) — the LAION curation
    * recipe: score every (image, caption) pair by modality-embedding
    * cosine and keep only pairs above a threshold. The image side is the
    * md5 stub decoder's 4-dim feature (documents payload); the caption
    * side is the 64-dim embedding block-pooled to 4 dims
    * ([[graft.ext.Multimodal.blockPoolEmbedding]]); pairs join on
    * doc_id = vec_id.
    *
    * Scale: one equi-join on the pair id carrying metadata-sized rows
    * (embeddings, never payload bytes), then a pure codegen projection —
    * the gate prunes the corpus BEFORE any payload-heavy stage runs.
    * Determinism: every sum (block pool, dot, norms) is an explicit
    * left-associated chain over exact float→double values, so both
    * engines walk the identical IEEE tree; 6-dp round at the end only;
    * zero-norm pairs yield NULL score + kept=0 on both engines. */
  val clipAlignGate = Q(
    "ext_clip_align_gate",
    (s, d) => {
      val img = Tables.documents(s, d).select(col("doc_id"),
        graft.ext.Multimodal.decodeFeatures(
          graft.ext.Multimodal.asPayload(col("text"))).as("img_emb"))
      val txt = Tables.embeddings(s, d).select(
        col("vec_id").as("doc_id"),
        graft.ext.Multimodal.blockPoolEmbedding(col("embedding"), 4, 16).as("txt_emb"))
      graft.ext.Multimodal.clipAlignmentGate(img.join(txt, Seq("doc_id")),
        "img_emb", "txt_emb", dim = 4, tau = 0.1)
        .select(col("doc_id"), col("clip_score"), col("kept"))
    },
    Some {
      def f(i: Int) =
        s"""round(('0x' || substring(md5(text), ${i * 8 + 1}, 8))::BIGINT
           / 4294967296.0, 6) AS i$i"""
      def t(b: Int) =
        "(" + (0 until 16)
          .map(i => s"CAST(embedding[${b * 16 + i + 1}] AS DOUBLE)")
          .mkString(" + ") + s") / 16.0 AS t$b"
      def dot(a: String, b: String) =
        (0 until 4).map(i => s"$a$i * $b$i").mkString(" + ")
      s"""WITH img AS (
        SELECT doc_id, ${(0 until 4).map(f).mkString(", ")}
        FROM documents),
      txt AS (
        SELECT vec_id AS doc_id, ${(0 until 4).map(t).mkString(", ")}
        FROM embeddings),
      j AS (SELECT img.doc_id, i0, i1, i2, i3, t0, t1, t2, t3
            FROM img JOIN txt USING (doc_id)),
      sc AS (
        SELECT doc_id,
          CASE WHEN (${dot("i", "i")}) > 0 AND (${dot("t", "t")}) > 0
            THEN round((${dot("i", "t")})
              / (sqrt(${dot("i", "i")}) * sqrt(${dot("t", "t")})), 6)
          END AS clip_score
        FROM j)
      SELECT doc_id, clip_score,
        CAST(clip_score IS NOT NULL AND clip_score >= 0.1 AS INT) AS kept
      FROM sc"""
    })

  /** DoReMi-style domain reweighting
    * ([[graft.ext.Curation.doremiWeights]]): per-source sampling weights
    * boosted where the domain's loss exceeds the corpus baseline — the
    * mixture-optimization step between per-domain stats and the sampler
    * (`ext_source_mix` takes the resulting multipliers). The loss proxy
    * here is per-doc character entropy (the `ext_char_entropy` signal);
    * a production run feeds reference-model NLL through the same API.
    * Bounded domain-keyed aggregates + two 1-row broadcasts; exact
    * decimal sums; the exp/ln round-argument-round-result discipline. */
  val doremiWeights = Q(
    "ext_doremi_weights",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val loss = TextStats.charEntropy(docs, "text", "doc_id")
        .select(col("doc_id"), col("char_entropy").as("loss"))
      graft.ext.Curation.doremiWeights(docs, loss, "doc_id", "source",
        tau = 0.02, expCap = 10.0)
    },
    Some("""WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents),
      hist AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
                sum(CAST(c * round(ln(c), 6) AS DECIMAL(18,6))) AS s
              FROM hist GROUP BY 1),
      ent AS (
        SELECT d.source AS domain,
          round(ln(a.n) - CAST(a.s AS DOUBLE) / a.n, 6) AS loss
        FROM agg a JOIN documents d USING (doc_id)),
      dom AS (
        SELECT domain, count(*) AS n_docs,
          sum(CAST(loss AS DECIMAL(18,6))) AS s
        FROM ent GROUP BY domain),
      tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_total, sum(s) AS st
        FROM dom),
      base AS (
        SELECT domain, n_docs,
          round(CAST(s AS DOUBLE) / n_docs, 6) AS domain_loss,
          greatest(round(CAST(s AS DOUBLE) / n_docs, 6)
            - round(CAST(st AS DOUBLE) / n_total, 6), 0.0) AS excess,
          round(CAST(n_docs AS DOUBLE) / n_total, 6) AS share
        FROM dom, tot),
      w AS (
        SELECT domain, n_docs, domain_loss, excess, share,
          round(share
            * round(exp(least(round(excess / 0.02, 6), 10.0)), 6), 6)
            AS w_raw
        FROM base),
      ws AS (SELECT sum(CAST(w_raw AS DECIMAL(18,6))) AS wsum FROM w)
      SELECT domain, n_docs, domain_loss, round(excess, 6) AS excess,
        share,
        round(w_raw / CAST(wsum AS DOUBLE), 6) AS weight,
        round(round(w_raw / CAST(wsum AS DOUBLE), 6) / share, 6)
          AS multiplier
      FROM w, ws"""))

  /** Tokenizer fertility per language
    * ([[graft.ext.TextStats.tokenizerFertility]]): subword-tokens-per-
    * word and chars-per-token by `lang` — the tokenizer-equity
    * diagnostic run before committing a vocab to a multilingual corpus.
    * One projection pass + a lang-keyed hash agg; exact long sums,
    * guarded ratios at the edge. */
  val tokenizerFertility = Q(
    "ext_tokenizer_fertility",
    (s, d) => TextStats.tokenizerFertility(
      Tables.documents(s, d), "text", "lang"),
    Some(s"""WITH pd AS (
        SELECT lang,
          len(string_split_regex(${ExtQueries.wsTrimSql("text")},
            '[ \\t\\n\\x0B\\f\\r]+')) AS n_words,
          len(regexp_extract_all(text,
            '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS n_bpe,
          length(text) AS n_chars
        FROM documents),
      agg AS (
        SELECT lang, count(*) AS n_docs,
          CAST(sum(n_words) AS BIGINT) AS t_words,
          CAST(sum(n_bpe) AS BIGINT) AS t_bpe,
          CAST(sum(n_chars) AS BIGINT) AS t_chars
        FROM pd GROUP BY lang)
      SELECT lang, n_docs, t_words, t_bpe,
        CASE WHEN t_words > 0
          THEN round(CAST(t_bpe AS DOUBLE) / t_words, 6) END AS fertility,
        CASE WHEN t_bpe > 0
          THEN round(CAST(t_chars AS DOUBLE) / t_bpe, 6) END
          AS chars_per_token
      FROM agg"""))

  /** Curriculum ordering ([[graft.ext.Curation.curriculumOrder]]) on
    * document length as the difficulty signal (short first — the
    * classic length curriculum): one sortable key per doc encoding
    * (length bin, source-interleave round, source slot), so the global
    * training order is a range partition at write time, never a global
    * row number. The oracle replays the percentile binning, the
    * (source, bin)-cell md5 rank, and the key arithmetic. */
  val curriculumOrder = Q(
    "ext_curriculum_order",
    (s, d) => graft.ext.Curation.curriculumOrder(
      Tables.documents(s, d), "doc_id", "source", "n_chars", bins = 8,
      // integer doc length: distinct support bounded by the longest
      // doc, not the corpus → the bounded single-aggregate cut plan
      boundedDistinct = true),
    Some {
      val qs = (1 until 8).map(i => (i.toDouble / 8).toString)
      s"""WITH cuts AS (
        SELECT quantile_disc(n_chars, [${qs.mkString(", ")}]) AS cuts
        FROM documents),
      binned AS (
        SELECT doc_id, source,
          len(list_filter(cuts, c -> c <= n_chars)) AS bin
        FROM documents, cuts),
      rk AS (
        SELECT doc_id, source, bin,
          CAST(row_number() OVER (PARTITION BY source, bin
            ORDER BY ('0x' || substring(
                md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
              doc_id) - 1 AS BIGINT) AS r,
          ('0x' || substring(md5('slot:' || source), 1, 8))::BIGINT
            % 1048576 AS slot
        FROM binned)
      SELECT doc_id, source, bin, r, slot,
        (CAST(bin AS BIGINT) * 4294967296 + r) * 1048576 + slot
          AS curriculum_key
      FROM rk"""
    })

  /** Per-dimension embedding standardization
    * ([[graft.ext.Similarity.standardizeEmbeddings]]): z-score whitening
    * with corpus (mean, std) per dimension — the PQ/IVF preprocessing
    * that `ext_emb_dim_stats` diagnoses the need for. One dim-keyed
    * aggregate broadcast as a single stats row, then a stateless
    * zip_with projection; fixed-point rendering for the hash gate. */
  val embStandardize = Q(
    "ext_emb_standardize",
    (s, d) => Similarity.standardizeEmbeddings(
      Tables.embeddings(s, d), "vec_id", "embedding"),
    Some(s"""WITH x AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
          CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings),
      w AS (
        SELECT dim, count(*) AS n,
          ${Det.dsumWideSql("v")} AS sx,
          ${Det.dsumWideSql("v * v")} AS sxx
        FROM x GROUP BY dim),
      st AS (
        SELECT dim, round(sx / n, 6) AS mu,
          round(sqrt(round((sxx - sx * sx / n) / n, 6)), 6) AS sd
        FROM w),
      z AS (
        SELECT vec_id, x.dim,
          CASE WHEN sd > 0
            THEN CAST(CAST(round(round((v - mu) / sd, 6) * 1000000)
              AS BIGINT) AS VARCHAR)
            ELSE 'n' END AS zf
        FROM x JOIN st USING (dim))
      SELECT vec_id, string_agg(zf, ',' ORDER BY dim) AS z_fp
      FROM z GROUP BY vec_id"""))

  /** Negative-sampling table (Mikolov et al. 2013's unigram^0.75
    * distribution): every vocabulary token with its smoothed weight and
    * HALF-OPEN cumulative range [cum_lo, cum_hi) under the
    * (weight desc, token) total order — the lookup table an NCE/word2vec
    * trainer binary-searches with a uniform draw. The cumulative sums
    * ride the property-tested two-phase distributed prefix sum
    * ([[graft.RetailQueries.paretoCumShare]]) — range-partitioned, never
    * a global single-reducer window — and the oracle replays the same
    * order with a window cumulative sum over exact decimals. */
  /** Shared Spark construction of the sampling table (consumed by the
    * table query and the draws query below — one definition). */
  private def negTableDf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val counts = Tables.documents(s, d)
      .select(explode(TextStats.tokens(lower(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_count"))
    val w = counts.withColumn("wd",
      round(pow(col("n_count").cast("double"), 0.75), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
    RetailQueries.paretoCumShare(w, "token", "wd")
      .select(col("token"), col("n_count"),
        col("wd").cast("double").as("weight"),
        round((col("__cum") - col("wd")).cast("double")
          / col("__tot").cast("double"), 6).as("cum_lo"),
        col("cum_share").as("cum_hi"))
  }

  /** The matching DuckDB CTE chain, ending in `negtbl`. */
  private def negTableSqlCtes: String =
    s"""toks AS (
        SELECT unnest(string_split_regex(
          ${ExtQueries.wsTrimSql("lower(text)")},
          '[ \\t\\n\\x0B\\f\\r]+')) AS tok
        FROM documents),
      c AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      w AS (SELECT tok, c,
          CAST(round(pow(c, 0.75), 6) AS DECIMAL(18,6)) AS wd
        FROM c),
      t AS (SELECT sum(wd) AS tot FROM w),
      cum AS (
        SELECT tok, c, wd,
          sum(wd) OVER (ORDER BY wd DESC, tok
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        FROM w),
      negtbl AS (
        SELECT tok AS token, c AS n_count, CAST(wd AS DOUBLE) AS weight,
          round(CAST(cm - wd AS DOUBLE) / CAST(tot AS DOUBLE), 6)
            AS cum_lo,
          round(CAST(cm AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_hi
        FROM cum, t)"""

  val negSamplingTable = Q(
    "ext_negative_sampling_table",
    (s, d) => negTableDf(s, d),
    Some(s"""WITH $negTableSqlCtes
      SELECT token, n_count, weight, cum_lo, cum_hi FROM negtbl"""))

  /** Sampler-draw materialization
    * ([[graft.ext.Sketches.sampleFromCumTable]]): 1000 deterministic
    * md5 uniforms looked up against the sampling table's half-open
    * ranges — the negative-batch generation a contrastive trainer runs
    * per step. The Spark side uses the BUCKETIZED broadcast equi-join
    * (unit interval cut into 256 cells, the alias-table lookup at
    * billions-of-draws scale); the oracle replays the plain range join,
    * which is the same function because the ranges tile [0,1) and the
    * bucket stage only over-covers before the exact filter. */
  val negSampleDraws = Q(
    "ext_negative_sample_draws",
    (s, d) => {
      val draws = s.range(1000).select(col("id").as("draw_id"),
        ((TextDedup.baseHash(
          concat(lit("draw:"), col("id").cast("string"))) + 1)
          .cast("double") / lit(4294967296.0)).as("u"))
      graft.ext.Sketches.sampleFromCumTable(draws, "u",
        negTableDf(s, d), "cum_lo", "cum_hi", buckets = 256)
        .select(col("draw_id"), round(col("u"), 6).as("u6"),
          col("token"), col("n_count"))
    },
    Some(s"""WITH $negTableSqlCtes,
      draws AS (
        SELECT i AS draw_id,
          (('0x' || substring(md5('draw:' || CAST(i AS VARCHAR)), 1, 8))
            ::BIGINT + 1) / 4294967296.0 AS u
        FROM range(0, 1000) t(i))
      SELECT d.draw_id, round(d.u, 6) AS u6, n.token, n.n_count
      FROM draws d JOIN negtbl n
        ON d.u >= n.cum_lo AND d.u < n.cum_hi"""))

  /** KMV set algebra ([[graft.ext.Sketches.kmvPairOverlap]], k=128):
    * estimated Jaccard / union / intersection for every group pair from
    * the k-minimum-value sketches ALONE — the cross-feed overlap matrix
    * with NO joint pass over the corpora (the exact twin
    * `ext_source_overlap` joins fingerprints; this one only merges
    * k-long sketch rows). Groups are deliberately overlapping slices
    * (all / even ids / ids ≡ 0 mod 3) so every pair has a known true
    * Jaccard (1/2, 1/3, ~1/4) the estimates must land near. */
  val kmvJaccard = Q(
    "ext_kmv_jaccard",
    (s, d) => {
      val k = 128
      val docs = Tables.documents(s, d)
      val member = docs.select(col("text"),
        explode(array(
          lit("all"),
          when(col("doc_id") % 2 === 0, lit("even2")),
          when(col("doc_id") % 3 === 0, lit("mult3")))).as("grp"))
        .filter(col("grp").isNotNull)
      val sketches = member.groupBy(col("grp"))
        .agg(graft.functions.KmvAgg.kmv_sketch(
          TextDedup.baseHash(col("text")), k).as("sk"))
      graft.ext.Sketches.kmvPairOverlap(sketches, "grp", "sk", k)
    },
    Some("""WITH m AS (
        SELECT text, 'all' AS grp FROM documents
        UNION ALL
        SELECT text, 'even2' FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT text, 'mult3' FROM documents WHERE doc_id % 3 = 0),
      h AS (
        SELECT DISTINCT grp,
          ('0x' || substring(md5(text), 1, 8))::BIGINT AS hv
        FROM m),
      r AS (
        SELECT grp, hv,
          row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
        FROM h),
      sk AS (
        SELECT grp, array_agg(hv ORDER BY hv) AS sk
        FROM r WHERE rn <= 128 GROUP BY grp),
      p AS (
        SELECT a.grp AS group_a, a.sk AS ska, b.grp AS group_b,
          b.sk AS skb
        FROM sk a CROSS JOIN sk b WHERE a.grp < b.grp),
      c AS (
        SELECT group_a, group_b, ska, skb,
          list_sort(list_distinct(list_concat(ska, skb)))[1:128] AS ku
        FROM p),
      j AS (
        SELECT group_a, group_b, ku,
          round(CAST(len(list_filter(ku, x ->
              list_contains(ska, x) AND list_contains(skb, x)))
            AS DOUBLE) / len(ku), 6) AS jaccard
        FROM c),
      e AS (
        SELECT group_a, group_b, jaccard,
          CASE WHEN len(ku) < 128 THEN CAST(len(ku) AS DOUBLE)
            ELSE round(127.0 / ((ku[128] + 1) / 4294967296.0), 6) END
            AS union_est
        FROM j)
      SELECT group_a, group_b, jaccard, union_est,
        round(jaccard * union_est, 6) AS intersect_est
      FROM e"""))

  /** Rolling 7-day active users from PER-DAY HLL sketches — the
    * mergeable-sketch answer to the WAU/MAU rolling-distinct problem:
    * exact rolling distinct re-touches every event 7× per day, while
    * per-day 256-byte sketches merge register-wise across any window
    * after the corpus is read ONCE. The day-range join broadcasts the
    * DAY-grain frames (aggregate-bounded — a year is 365 rows), so at
    * 100 TB the only corpus-sized pass is the daily sketch build; the
    * exact count rides along as the accuracy reference (audit column —
    * production drops it and the second corpus pass with it). The
    * oracle replays per-day registers, the windowed register max, and
    * the shared [[graft.ops.IncrementalAgg.hllEstimateSql]] estimator.
    */
  val hllRollingWau = Q(
    "ext_hll_rolling_wau",
    (s, d) => {
      val p = 8
      val ev = Tables.events(s, d).select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      val daily = graft.ops.CacheScope.persist(
        ev.groupBy(col("day"))
          .agg(graft.functions.HllAgg.hll_sketch(
            TextDedup.baseHash(col("user_id").cast("string")), p)
            .as("sk")))
      val days = daily.select(col("day").as("w_day"))
      val win = days.join(broadcast(daily),
        datediff(to_date(col("w_day")), to_date(col("day"))).between(0, 6))
      val merged = win
        .select(col("w_day"), posexplode(col("sk")).as(Seq("reg", "m")))
        .groupBy(col("w_day"), col("reg")).agg(max(col("m")).as("m"))
        .groupBy(col("w_day"))
        .agg(transform(
          array_sort(collect_list(struct(col("reg"), col("m")))),
          x => x.getField("m")).as("sk"))
      val exact = broadcast(days).join(ev,
        datediff(to_date(col("w_day")), to_date(col("day"))).between(0, 6))
        .groupBy(col("w_day"))
        .agg(countDistinct(col("user_id")).as("wau_exact"))
      merged.join(exact, Seq("w_day"))
        .select(col("w_day").as("day"),
          graft.ops.IncrementalAgg.hllEstimate(col("sk"), p)
            .as("wau_hll"),
          col("wau_exact"))
    },
    Some(s"""WITH ev AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
      h AS (
        SELECT DISTINCT day,
          ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
            AS hv
        FROM ev),
      reg AS (
        SELECT day, hv // 16777216 AS reg, hv % 16777216 AS w FROM h),
      mx AS (
        SELECT day, reg,
          max(CASE WHEN w = 0 THEN 25
              ELSE 25 - length(ltrim(bin(w), '0')) END) AS mj
        FROM reg GROUP BY 1, 2),
      days AS (SELECT DISTINCT day FROM ev),
      win AS (
        SELECT d.day AS w_day, m.reg, max(m.mj) AS mj
        FROM days d JOIN mx m
          ON CAST(d.day AS DATE) - CAST(m.day AS DATE) BETWEEN 0 AND 6
        GROUP BY 1, 2),
      est AS (
        SELECT w_day,
          sum(pow(2.0, -mj)) + (256 - count(*)) * 1.0 AS s,
          256 - count(*) AS v
        FROM win GROUP BY 1),
      ex AS (
        SELECT d.day AS w_day, count(DISTINCT e.user_id) AS wau_exact
        FROM days d JOIN ev e
          ON CAST(d.day AS DATE) - CAST(e.day AS DATE) BETWEEN 0 AND 6
        GROUP BY 1)
      SELECT e.w_day AS day,
        ${graft.ops.IncrementalAgg.hllEstimateSql("s", "v", 8)}
          AS wau_hll,
        x.wau_exact
      FROM est e JOIN ex x USING (w_day)"""))

  /** UniMax budget waterfilling ([[graft.ext.Curation.unimaxMix]]) —
    * the epoch-capped uniform alternative to temperature sampling
    * (`ext_temperature_resample`): budget spreads evenly, no source
    * repeats past `epochCap` epochs. Budget 280k chars at epoch cap 2
    * makes the waterline discriminate at sf0.01 (the four smallest
    * sources cap out; the rest sit at the common waterline, which the
    * oracle proves consumes the budget exactly). All the window math
    * runs at source cardinality — see the fn scaladoc. */
  val unimaxMixQ = {
    val budget = 280000.0
    val epochs = 2.0
    Q("ext_unimax_mix",
      (s, d) => graft.ext.Curation.unimaxMix(
        Tables.documents(s, d), "source", "n_chars", budget, epochs),
      Some(s"""WITH supply AS (
          SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_supply,
            $epochs * CAST(sum(n_chars) AS DOUBLE) AS cap
          FROM documents GROUP BY 1),
        idx AS (
          SELECT source, n_supply, cap,
            row_number() OVER w AS idx,
            CAST(sum(CAST(cap AS DECIMAL(38,6))) OVER w AS DOUBLE)
              AS prefix,
            count(*) OVER () AS n_src
          FROM supply WINDOW w AS (ORDER BY cap ASC, source ASC)),
        marked AS (
          SELECT *, CASE WHEN cap * CAST(n_src - idx + 1 AS DOUBLE)
              + (prefix - cap) <= $budget THEN 1 ELSE 0 END AS capped
          FROM idx),
        kp AS (
          SELECT *, CAST(sum(capped) OVER () AS BIGINT) AS k,
            coalesce(max(CASE WHEN capped = 1 THEN prefix END) OVER (),
              0.0) AS p_k
          FROM marked)
        SELECT source, n_supply, round(cap, 6) AS cap, capped,
          CASE WHEN capped = 1 THEN round(cap, 6)
            ELSE round(($budget - p_k) / CAST(n_src - k AS DOUBLE), 6)
            END AS alloc,
          round(CASE WHEN capped = 1 THEN round(cap, 6)
            ELSE round(($budget - p_k) / CAST(n_src - k AS DOUBLE), 6)
            END / CAST(n_supply AS DOUBLE), 6) AS epochs_used
        FROM kp"""))
  }

  /** word2vec frequency subsampling ([[graft.ext.Vocab
    * .subsampleReport]]) at t = 1e-3 over the ≥10-count vocabulary:
    * word-grain corpus counts, keep probabilities, and the count the
    * deterministic per-occurrence md5 coin actually keeps — the
    * sampled OUTCOME is hash-gated, not just the math. The oracle
    * replays the `ext_tokenize_ids` tokenization (1-based positions),
    * the same p_keep expression, and the same coin. */
  val wordSubsampleQ = {
    val t = 0.001
    Q("ext_word_subsample",
      (s, d) => graft.ext.Vocab.subsampleReport(
        Tables.documents(s, d), "text", "doc_id", t, minCount = 10L),
      Some(s"""WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text),
            ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
            '[ \\t\\n\\x0B\\f\\r]+') AS t
          FROM documents),
        flat AS (
          SELECT doc_id, s.pos AS pos, s.tok AS tok FROM (
            SELECT doc_id,
              unnest(list_transform(generate_series(1, len(t)),
                i -> struct_pack(pos := i, tok := t[i]))) AS s
            FROM toks)),
        cnt AS (SELECT tok, count(*) AS c FROM flat GROUP BY 1),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM cnt),
        vocab AS (
          SELECT tok, CAST(c AS BIGINT) AS c,
            round(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS f,
            round(least(1.0,
              sqrt($t / (CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)))
              + $t / (CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE))), 6)
              AS p_keep
          FROM cnt CROSS JOIN tot WHERE c >= 10)
        SELECT v.tok, v.c, v.f, v.p_keep,
          CAST(count(*) FILTER (
            ('0x' || substring(md5(CAST(o.doc_id AS VARCHAR) || ':' ||
              CAST(o.pos AS VARCHAR) || ':' || o.tok), 1, 8))::BIGINT
              / 4294967296.0 < v.p_keep) AS BIGINT) AS n_kept
        FROM flat o JOIN vocab v USING (tok)
        GROUP BY 1, 2, 3, 4"""))
  }

  /** Subdomain-aware domain blocklist ([[graft.ext.Markup
    * .suffixBlocklistReport]]) over a corpus salted with a benign shop
    * URL per doc, a `cdn<i>.ads.tracker.net` subdomain on doc_id%3, a
    * bare `tracker.net` on doc_id%11, and the near-miss
    * `nottracker.net` on doc_id%13 — the case exact-match `IN` passes
    * and naive `LIKE '%tracker.net'` wrongly blocks. The oracle spells
    * the suffix rule as the naive per-entry LIKE; the Spark side is
    * the bounded suffix-explode `arrays_overlap`. */
  val suffixBlocklistQ = Q(
    "ext_domain_suffix_blocklist",
    (s, d) => graft.ext.Markup.suffixBlocklistReport(
      Tables.documents(s, d).select(
        col("doc_id"),
        concat(col("text"),
          lit(" https://www.shop"), col("doc_id") % 7,
          lit(".example/p/"), col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" http://cdn"), col("doc_id") % 5,
              lit(".ads.tracker.net/px"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" https://tracker.net/x"))
            .otherwise(lit("")),
          when(col("doc_id") % 13 === 0, lit(" https://nottracker.net/y"))
            .otherwise(lit(""))).as("text")),
      "text", "doc_id",
      blocklist = Seq("tracker.net", "spam.example")),
    Some("""WITH raw AS (
        SELECT doc_id,
          text || ' https://www.shop' || CAST(doc_id % 7 AS VARCHAR)
          || '.example/p/' || doc_id
          || CASE WHEN doc_id % 3 = 0
               THEN ' http://cdn' || CAST(doc_id % 5 AS VARCHAR)
                 || '.ads.tracker.net/px' ELSE '' END
          || CASE WHEN doc_id % 11 = 0
               THEN ' https://tracker.net/x' ELSE '' END
          || CASE WHEN doc_id % 13 = 0
               THEN ' https://nottracker.net/y' ELSE '' END AS t
        FROM documents),
      hosts AS (
        SELECT doc_id,
          list_transform(
            regexp_extract_all(t, 'https?://([^/ \t\n\x0B\f\r?#"'']+)', 1),
            h -> lower(h)) AS hs
        FROM raw)
      SELECT doc_id, len(hs) AS n_urls,
        len(list_filter(hs, h -> h = 'tracker.net'
          OR h LIKE '%.tracker.net'
          OR h = 'spam.example' OR h LIKE '%.spam.example')) AS n_blocked,
        CAST(len(list_filter(hs, h -> h = 'tracker.net'
          OR h LIKE '%.tracker.net'
          OR h = 'spam.example'
          OR h LIKE '%.spam.example')) = 0 AS INT) AS keep
      FROM hosts"""))

  /** Per-source topic terms ([[graft.ext.Retrieval.groupTopTerms]]) —
    * cluster/source labeling by group-tf × ln(G/df) with df counted
    * over GROUPS: corpus-wide boilerplate (df = G) scores exactly 0 and
    * distinguishing vocabulary surfaces. All aggregates collapse to
    * group-vocabulary grain before any window; ranking partitions by
    * source. */
  val sourceTopicsQ = Q(
    "ext_source_topics",
    (s, d) => graft.ext.Retrieval.groupTopTerms(
      Tables.documents(s, d), "text", "source", 5),
    Some("""WITH flat AS (
        SELECT source, unnest(string_split_regex(trim(lower(text),
          ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
          '[ \t\n\x0B\f\r]+')) AS term
        FROM documents),
      tf AS (SELECT source, term, count(*) AS tf FROM flat GROUP BY 1, 2),
      dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      ng AS (SELECT count(DISTINCT source) AS n_groups FROM tf),
      scored AS (
        SELECT source, term, tf, df,
          round(tf * round(ln(CAST(n_groups AS DOUBLE)
            / CAST(df AS DOUBLE)), 6), 6) AS score
        FROM tf JOIN dfq USING (term) CROSS JOIN ng),
      r AS (
        SELECT *, row_number() OVER (PARTITION BY source
          ORDER BY score DESC, term ASC) AS rank
        FROM scored)
      SELECT source, CAST(rank AS INT) AS rank, term, tf, df, score
      FROM r WHERE rank <= 5"""))

  /** ROUGE-2 scoring of adjacent-id document pairs
    * ([[graft.ext.TextDedup.rougeN]], distinct-bigram form) — the
    * candidate-vs-reference overlap metric a pipeline runs on proposed
    * rewrites/augmentations before admitting them; here each doc scores
    * against its successor as the deterministic pair fixture. Pair
    * list in, two id-keyed joins, stateless array intersection. */
  val rougePairsQ = Q(
    "ext_rouge_pairs",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = docs.select(col("doc_id").as("cand_id"),
        (col("doc_id") + 1).as("ref_id"))
      graft.ext.TextDedup.rougeN(docs, "text", "doc_id", pairs, n = 2)
    },
    Some("""WITH toks AS (
        SELECT doc_id, string_split_regex(trim(lower(text),
          ' ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13)),
          '[ \t\n\x0B\f\r]+') AS t
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(CASE WHEN len(t) >= 2
          THEN list_transform(generate_series(1, len(t) - 1),
            i -> t[i] || ' ' || t[i + 1])
          ELSE [] END) AS s
        FROM toks),
      p AS (
        SELECT a.doc_id AS cand_id, b.doc_id AS ref_id,
          a.s AS sa, b.s AS sb
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1),
      m AS (
        SELECT cand_id, ref_id,
          len(list_filter(sa, x -> list_contains(sb, x))) AS n_overlap,
          len(sa) AS n_cand, len(sb) AS n_ref
        FROM p),
      sc AS (
        SELECT cand_id, ref_id, n_overlap, n_cand, n_ref,
          CASE WHEN n_ref > 0
            THEN round(n_overlap / CAST(n_ref AS DOUBLE), 6)
            ELSE 0.0 END AS rouge_recall,
          CASE WHEN n_cand > 0
            THEN round(n_overlap / CAST(n_cand AS DOUBLE), 6)
            ELSE 0.0 END AS rouge_precision
        FROM m)
      SELECT *, CASE WHEN rouge_recall + rouge_precision > 0
        THEN round(2.0 * rouge_recall * rouge_precision
          / (rouge_recall + rouge_precision), 6)
        ELSE 0.0 END AS rouge_f1
      FROM sc"""))

  // ---------------------------------------------------------------- ER

  /** Shared ER fixture: the customer table as a TWO-FEED record set.
    * Salt (the [[ExtQueries.sourceOverlap]] pattern — the synthetic
    * table has no real typos, so the cross-system duplicate is
    * constructed in-flight): every 7th customer also arrives from a
    * 'web' feed with a new surrogate id, ONE substituted character at
    * the end of the name (each digit bumped via `translate`, so the
    * twin is exactly Levenshtein 1 from its original — and collides
    * exactly with a DIFFERENT customer's name, the classic same-name/
    * different-person trap the field scoring must reject), and a
    * 0.25-drifted balance (inside the closeness tolerance, but able to
    * cross a coarse bucket boundary — which is what the multi-pass
    * blocking exists to absorb). */
  private def erRecs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("rid"),
      lower(col("c_name")).as("name"),
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("bal"),
      lit("crm").as("feed"))
    val dirty = base.filter(col("rid") % 7 === 0).select(
      (col("rid") + 10000000L).as("rid"),
      concat(
        col("name").substr(lit(1), length(col("name")) - 1),
        translate(col("name").substr(length(col("name")), lit(1)),
          "0123456789", "1234567890")).as("name"),
      col("nation"), col("segment"),
      (col("bal") + 0.25).as("bal"),
      lit("web").as("feed"))
    base.unionByName(dirty)
  }

  /** Blocked + verified + scored match pairs over a PERSISTED record
    * frame ([[graft.ext.RecordLinkage]]): two blocking passes (name
    * prefix fixing all but the last two chars; nation|segment|balance-
    * bucket attribute key), pair-dedup before the thresholded
    * Levenshtein, then the linear Fellegi–Sunter agreement score over
    * (name distance, nation, segment, balance-within-1.0). Threshold
    * 8.0 admits only pairs agreeing on every field with name distance
    * ≤ 2 — the planted cross-feed twins — while the same-name/
    * different-person collisions score 0.7 and fall out. */
  private def erMatchedFrom(
      recs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val k1 = col("name").substr(lit(1), length(col("name")) - 2)
    val k2 = concat(col("nation").cast("string"), lit("|"),
      col("segment"), lit("|"),
      floor(col("bal") / 100).cast("string"))
    val pairs = graft.ext.RecordLinkage.blockedCandidates(
      recs, "rid", "name", Seq(k1, k2), maxDist = 2)
    graft.ext.RecordLinkage
      .joinAttrs(pairs, recs, "rid", Seq("nation", "segment", "bal"))
      .withColumn("score", round(
        (lit(4.0) - lit(2.0) * col("name_dist"))
          + when(col("nation_a") === col("nation_b"), 3.0).otherwise(-1.5)
          + when(col("segment_a") === col("segment_b"), 1.2).otherwise(-0.8)
          + when(abs(col("bal_a") - col("bal_b")) <= 1.0, 2.0)
              .otherwise(-1.0),
        6))
      .filter(col("score") >= 8.0)
      .select("id_a", "id_b", "name_dist", "score")
  }

  /** DuckDB replay of [[erRecs]] + [[erMatchedFrom]], ending in
    * `matched(id_a, id_b, name_dist, score)`. The score expression
    * carries the Spark Column tree's exact left-assoc parenthesization
    * so both engines fold the same IEEE sums. */
  private def erCteBase: String = s"""base AS (
      SELECT c_custkey AS rid, lower(c_name) AS name,
        c_nationkey AS nation, c_mktsegment AS segment,
        c_acctbal AS bal, 'crm' AS feed
      FROM customer),
    recs AS MATERIALIZED (
      SELECT * FROM base
      UNION ALL
      SELECT rid + 10000000 AS rid,
        substring(name, 1, length(name) - 1) ||
          translate(substring(name, length(name), 1),
            '0123456789', '1234567890') AS name,
        nation, segment, bal + 0.25 AS bal, 'web' AS feed
      FROM base WHERE rid % 7 = 0),
    keyed AS (
      SELECT 0 AS bk_idx, substring(name, 1, length(name) - 2) AS bk,
        rid, name FROM recs
      UNION ALL
      SELECT 1 AS bk_idx,
        CAST(nation AS VARCHAR) || '|' || segment || '|' ||
          CAST(CAST(floor(bal / 100) AS BIGINT) AS VARCHAR) AS bk,
        rid, name FROM recs),
    cand AS (
      SELECT DISTINCT a.rid AS id_a, b.rid AS id_b,
        a.name AS nm_a, b.name AS nm_b
      FROM keyed a JOIN keyed b
        ON a.bk_idx = b.bk_idx AND a.bk = b.bk AND a.rid < b.rid),
    verified AS (
      SELECT id_a, id_b, levenshtein(nm_a, nm_b) AS name_dist
      FROM cand WHERE levenshtein(nm_a, nm_b) <= 2),
    scored AS (
      SELECT v.id_a, v.id_b, v.name_dist,
        round((((CAST(4.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * v.name_dist)
          + CASE WHEN ra.nation = rb.nation THEN CAST(3.0 AS DOUBLE)
                 ELSE CAST(-1.5 AS DOUBLE) END)
          + CASE WHEN ra.segment = rb.segment THEN CAST(1.2 AS DOUBLE)
                 ELSE CAST(-0.8 AS DOUBLE) END)
          + CASE WHEN abs(ra.bal - rb.bal) <= 1.0 THEN CAST(2.0 AS DOUBLE)
                 ELSE CAST(-1.0 AS DOUBLE) END,
          6) AS score
      FROM verified v JOIN recs ra ON v.id_a = ra.rid
        JOIN recs rb ON v.id_b = rb.rid),
    matched AS MATERIALIZED (
      SELECT * FROM scored WHERE score >= 8.0)"""

  /** [[erCteBase]] + exact transitive closure → `comp(rid, entity_id)`
    * (the [[ExtQueries.dedupComponents]] oracle shape). */
  private def erCompCte: String = s"""RECURSIVE $erCteBase,
    edges AS (
      SELECT id_a AS a, id_b AS b FROM matched
      UNION ALL SELECT id_b, id_a FROM matched),
    reach(a, b) AS (
      SELECT rid, rid FROM recs
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS rid, min(b) AS entity_id FROM reach GROUP BY a)"""

  /** Record-linkage match pairs ([[graft.ext.RecordLinkage]]): the
    * blocked, edit-distance-verified, field-agreement-scored customer
    * pairs across the crm/web feeds. */
  val erMatchScoresQ = Q(
    "er_match_scores",
    (s, d) => erMatchedFrom(graft.ops.CacheScope.persist(erRecs(s, d))),
    Some(s"""WITH $erCteBase
      SELECT id_a, id_b, name_dist, score FROM matched"""))

  /** Entity clustering over the ER matches: transitive closure via the
    * pointer-jump components ([[graft.ext.TextDedup.connectedComponents]]),
    * every record labeled with its entity's min record id. */
  val erEntityClustersQ = Q(
    "er_entity_clusters",
    (s, d) => {
      val recs = graft.ops.CacheScope.persist(erRecs(s, d))
      TextDedup.connectedComponents(recs, "rid", erMatchedFrom(recs))
        .select(col("rid"), col("rep_id").as("entity_id"))
    },
    Some(s"""WITH $erCompCte
      SELECT rid, entity_id FROM comp"""))

  /** Golden-record survivorship: one merged row per resolved entity —
    * record/feed counts plus deterministic field survivors (min name,
    * max balance, min nation). One id-keyed join of the component
    * labels to the record frame + one entity-keyed hash agg:
    * entity-cardinality output, never a second pass over pairs. */
  val erGoldenRecordsQ = Q(
    "er_golden_records",
    (s, d) => {
      val recs = graft.ops.CacheScope.persist(erRecs(s, d))
      val comp = TextDedup.connectedComponents(recs, "rid",
        erMatchedFrom(recs))
      recs.join(comp, Seq("rid"))
        .groupBy(col("rep_id").as("entity_id"))
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("feed")).as("n_feeds"),
          min(col("name")).as("name"),
          max(col("bal")).as("bal"),
          min(col("nation")).as("nation"))
    },
    Some(s"""WITH $erCompCte
      SELECT c.entity_id, count(*) AS n_records,
        count(DISTINCT r.feed) AS n_feeds,
        min(r.name) AS name, max(r.bal) AS bal, min(r.nation) AS nation
      FROM comp c JOIN recs r ON c.rid = r.rid
      GROUP BY 1"""))

  /** Incremental ER as a structured stream
    * ([[graft.streaming.StreamPipeline.erAssignAvailableNow]]): newly
    * arriving 'web' records blocked against the static master,
    * verified and scored row-locally, assigned their master entity —
    * stateless stream-static join, append output. The oracle replays
    * the single-pass block join + verify + score in batch SQL. */
  val erStreamAssignQ = Q(
    "q_stream_er_assign",
    (s, d) => graft.streaming.StreamPipeline.erAssignAvailableNow(s, d),
    Some("""WITH base AS (
        SELECT c_custkey AS rid, lower(c_name) AS name,
          c_nationkey AS nation, c_mktsegment AS segment,
          c_acctbal AS bal
        FROM customer),
      dirty AS (
        SELECT rid + 10000000 AS rid,
          substring(name, 1, length(name) - 1) ||
            translate(substring(name, length(name), 1),
              '0123456789', '1234567890') AS name,
          nation, segment, bal + 0.25 AS bal
        FROM base WHERE rid % 7 = 0),
      cand AS (
        SELECT i.rid AS rid, m.rid AS entity_id,
          levenshtein(i.name, m.name) AS name_dist,
          i.nation AS nation_i, m.nation AS nation_m,
          i.segment AS segment_i, m.segment AS segment_m,
          i.bal AS bal_i, m.bal AS bal_m
        FROM dirty i JOIN base m
          ON substring(i.name, 1, length(i.name) - 2)
             = substring(m.name, 1, length(m.name) - 2)),
      scored AS (
        SELECT rid, entity_id, name_dist,
          round((((CAST(4.0 AS DOUBLE)
              - CAST(2.0 AS DOUBLE) * name_dist)
            + CASE WHEN nation_i = nation_m THEN CAST(3.0 AS DOUBLE)
                   ELSE CAST(-1.5 AS DOUBLE) END)
            + CASE WHEN segment_i = segment_m THEN CAST(1.2 AS DOUBLE)
                   ELSE CAST(-0.8 AS DOUBLE) END)
            + CASE WHEN abs(bal_i - bal_m) <= 1.0
                   THEN CAST(2.0 AS DOUBLE)
                   ELSE CAST(-1.0 AS DOUBLE) END,
            6) AS score
        FROM cand WHERE name_dist <= 2)
      SELECT rid, entity_id, name_dist, score
      FROM scored WHERE score >= 8.0"""))

  def all: Seq[Q] = Seq(
    pmiCooccur, zipfFit, contaminationSemantic, streamDedup,
    hllDistinct, embDimStats, streamSessionsState, hllMergeEpochs,
    contentType, clipAlignGate, doremiWeights, tokenizerFertility,
    curriculumOrder, embStandardize, negSamplingTable, negSampleDraws,
    kmvJaccard, hllRollingWau, unimaxMixQ, wordSubsampleQ,
    suffixBlocklistQ, sourceTopicsQ, rougePairsQ,
    erMatchScoresQ, erEntityClustersQ, erGoldenRecordsQ, erStreamAssignQ)
}

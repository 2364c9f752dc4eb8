package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary + BPE tokenizer induction (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training half of an LLM data pipeline.
  *
  * The 100 TB shape: every per-corpus pass here reduces the corpus to its
  * WORD VOCABULARY first (one explode + one hash aggregate with map-side
  * partials — the shuffle carries one row per distinct word, not per
  * occurrence). The BPE merge loop then iterates over that
  * vocabulary-sized frame only: per merge, one bounded aggregate to find
  * the best pair and one codegen'd/HOF projection to apply it. Corpus
  * size enters exactly once.
  */
object Vocab {

  /** (token, c) corpus word counts — lowercased whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextStats.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Global top-k vocabulary by frequency. `orderBy.limit` compiles to
    * TakeOrderedAndProject — per-partition bounded top-k merged on the
    * driver, never a single-reducer global sort. Total order
    * (c desc, tok asc) makes the boundary deterministic. */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    wordCounts(docs, textCol)
      .orderBy(col("c").desc, col("tok").asc)
      .limit(k)

  /** Tokenize the corpus to vocabulary-id SEQUENCES — the id arrays a
    * training data loader actually consumes: ids are frequency ranks
    * (1 = most frequent) over the top-`vocabSize` vocabulary under the
    * (count desc, token asc) total order; out-of-vocabulary tokens map
    * to 0 (UNK) and are counted per doc.
    *
    * Scale: the ranked vocabulary is `vocabSize` rows (its rank window
    * is bounded by V, never the corpus) and BROADCASTS to the token
    * join; order is restored per doc with `array_sort` over (pos, id)
    * structs — one hash aggregate keyed on doc id, no window over
    * corpus-sized data. */
  def tokenizeToIds(docs: DataFrame, textCol: String, idCol: String,
      vocabSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = topK(docs, textCol, vocabSize).select(col("tok"),
      row_number().over(Window.orderBy(col("c").desc, col("tok").asc))
        .as("id"))
    val toks = docs.select(col(idCol),
      posexplode(TextStats.tokens(lower(col(textCol))))
        .as(Seq("pos", "tok")))
    toks.join(broadcast(ranked), Seq("tok"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("id"), lit(0)).as("id"))
      .groupBy(col(idCol))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("id"))))
          .as("_ordered"),
        count(lit(1)).as("n_tokens"),
        sum((col("id") === 0).cast("long")).as("n_unk"))
      .select(col(idCol),
        transform(col("_ordered"), s => s.getField("id")).as("token_ids"),
        col("n_tokens"), col("n_unk"))
  }

  /** End-of-word marker (the Sennrich `</w>`): merges cannot cross word
    * boundaries, and word-final subwords stay distinct from word-internal
    * ones. */
  val endToken = "</w>"

  /** A word as its initial BPE symbol sequence: characters + end marker. */
  private def initialSymbols(tok: Column): Column =
    concat(split(tok, ""), array(lit(endToken)))

  /** All ADJACENT symbol pairs (multiset — counts weight the merge
    * choice). */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** Replace every non-overlapping (l, r) adjacency with the merged
    * symbol, left to right in ONE pass (the BPE apply rule: a symbol
    * produced by this merge does not re-merge until a later pass). A
    * fold with (emitted, pending) state — `pending` holds the previous
    * symbol so the lookahead never re-reads the array. */
  private def mergeSeq(syms: Column, l: String, r: String): Column = {
    val empty = array().cast("array<string>")
    aggregate(
      syms,
      struct(empty.as("out"), lit(null).cast("string").as("pend")),
      (st, x) => {
        val out = st.getField("out")
        val pend = st.getField("pend")
        when(pend.isNull, struct(out.as("out"), x.as("pend")))
          .when(pend === l && x === r,
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(
            struct(concat(out, array(pend)).as("out"), x.as("pend")))
      },
      st => when(st.getField("pend").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"),
          array(st.getField("pend")))))
  }

  /** Learn `nMerges` BPE merge rules over the corpus. Returns the rules
    * in application order as (left, right, pair_count).
    *
    * Driver loop, but NOT a driver bottleneck: each iteration runs one
    * vocabulary-sized aggregate (pair → summed word count, map-side
    * partials) whose argmax — a single row — is all that ever reaches
    * the driver, then one projection applying the merge. The vocab frame
    * is re-persisted per iteration and the previous cache released, so
    * lineage stays one merge deep (without that, iteration k would
    * re-execute all k−1 earlier merges per job). Ties break on
    * (count desc, l asc, r asc) — a total order, so the learned
    * tokenizer is run- and layout-stable.
    *
    * Stops early when no pair occurs twice (every remaining pair count
    * ≤ 1 means merging memorizes hapax words, the standard cutoff). */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int)
      : Seq[(String, String, Long)] = {
    import org.apache.spark.storage.StorageLevel
    var vocab = wordCounts(docs, textCol)
      .select(initialSymbols(col("tok")).as("syms"), col("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val best = vocab
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("c"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < 2) done = true
      else {
        val (l, r, n) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((l, r, n))
        val next = vocab
          .select(mergeSeq(col("syms"), l, r).as("syms"), col("c"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the parent cache
        vocab.unpersist(blocking = false)
        vocab = next
      }
      i += 1
    }
    vocab.unpersist(blocking = false)
    merges.result()
  }

  /** Apply learned merges to text: each whitespace word → its subword
    * symbols under the merge rules IN ORDER. One interpreted HOF chain
    * per merge — sized for modest rule counts (the demo regime); a
    * production tokenizer would compile the rules into a native
    * Expression. */
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextStats.tokens(lower(text)), tok =>
      merges.foldLeft(initialSymbols(tok)) { case (syms, (l, r)) =>
        mergeSeq(syms, l, r)
      }))

  /** Corpus-level tokenizer evaluation: learn `nMerges` BPE rules, apply
    * them to the word vocabulary, and report the compression the
    * tokenizer achieves — total words / subword tokens / characters and
    * the two ratios every tokenizer paper quotes (subwords per word,
    * characters per subword). Subword counts INCLUDE the `</w>` end
    * symbol while it remains unmerged — the count is exactly the length
    * of the symbol sequence a downstream model would consume.
    *
    * Scale shape: everything after [[bpeTrain]] is one vocabulary-sized
    * projection (the `nMerges`-deep merge fold per DISTINCT word, never
    * per occurrence) into a single global aggregate — corpus size enters
    * only through the word-count pass bpeTrain already does. Ratios are
    * exact-integer divisions rounded once at the end (engine-portable;
    * no intermediate rounding — the bitext lesson). */
  def bpeCompressionStats(
      docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val merges = bpeTrain(docs, textCol, nMerges).map { case (l, r, _) =>
      (l, r)
    }
    val syms = merges.foldLeft(initialSymbols(col("tok"))) {
      case (s, (l, r)) => mergeSeq(s, l, r)
    }
    wordCounts(docs, textCol)
      .select(col("c"), size(syms).cast("long").as("nsw"),
        length(col("tok")).cast("long").as("nch"))
      .agg(
        sum(col("c")).as("total_words"),
        sum(col("c") * col("nsw")).as("total_subwords"),
        sum(col("c") * col("nch")).as("total_chars"))
      .select(col("total_words"), col("total_subwords"), col("total_chars"),
        round(col("total_subwords") / col("total_words").cast("double"), 6)
          .as("subwords_per_word"),
        round(col("total_chars") / col("total_subwords").cast("double"), 6)
          .as("chars_per_subword"))
  }

  /** Windowed PMI collocations (Church & Hanks 1990): for ordered token
    * pairs (a before b) within `window` positions of each other,
    * `pmi = ln( p(a,b) / (p(a)·p(b)) )` with pair probability over all
    * emitted pairs and unigram probabilities over all tokens — the
    * association statistic behind collocation extraction and phrase
    * induction.
    *
    * Scale shape: the pair generation is a PURE PROJECTION — per doc,
    * `window` zip_with'd self-offset slices of the token array, flattened
    * and exploded; no self-join, no window function, one corpus pass.
    * Pair counts hash-aggregate with map-side combine (the shuffle
    * carries one row per distinct PAIR TYPE, never per occurrence); the
    * unigram side is [[wordCounts]] (vocab-bounded) and broadcasts onto
    * the pair frame. `minCount` prunes the hapax pair tail BEFORE the
    * frame is cached — at web scale hapax pairs dominate pair types and
    * must never persist; the pair total is recovered exactly from doc
    * lengths (Σ_d max(len−d,0), a cheap projection aggregate) so the
    * pruned frame never needs the tail back.
    *
    * Determinism: counts are integral; the pmi ratio divides exact longs
    * as double with the SAME parenthesization in the DuckDB oracle, and
    * ln() rounds to 6 dp (the libm rule). */
  def pmiCooccur(docs: DataFrame, textCol: String, window: Int = 2,
      minCount: Long = 5L): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val withTk = docs.select(
      TextStats.tokens(lower(col(textCol))).as("tk"))
    val pairs = withTk.select(explode(expr(
      s"""flatten(transform(sequence(1, $window), d ->
         zip_with(slice(tk, 1, greatest(size(tk) - d, 0)),
                  slice(tk, d + 1, greatest(size(tk) - d, 0)),
                  (x, y) -> struct(x AS a, y AS b))))""")).as("pr"))
      .select(col("pr.a").as("a"), col("pr.b").as("b"))
    // only the minCount SURVIVORS are kept/cached — at web scale the
    // hapax pair tail dominates the pair-type frame and must never
    // persist. The pair TOTAL therefore cannot come from the pruned
    // frame; it is recovered exactly from doc lengths instead
    // (each doc emits Σ_{d=1..w} max(len−d, 0) pairs), a cheap
    // projection aggregate.
    val cab = graft.ops.CacheScope.persist(
      pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= minCount))
    val pTotal = withTk.select(
      (1 to window).map(d0 =>
        greatest(size(col("tk")) - d0, lit(0)).cast("long"))
        .reduce(_ + _).as("np"))
      .agg(sum(col("np")).as("p_total"))
    val uni = graft.ops.CacheScope.persist(wordCounts(docs, textCol))
    val tTotal = uni.agg(sum(col("c")).as("t_total"))
    cab
      .join(broadcast(uni.select(col("tok").as("a"), col("c").as("c_a"))),
        Seq("a"))
      .join(broadcast(uni.select(col("tok").as("b"), col("c").as("c_b"))),
        Seq("b"))
      .crossJoin(broadcast(pTotal))
      .crossJoin(broadcast(tTotal))
      .select(col("a"), col("b"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") / col("p_total").cast("double")) /
            ((col("c_a").cast("double") / col("t_total").cast("double")) *
              (col("c_b").cast("double") / col("t_total").cast("double")))),
          6).as("pmi"))
  }

  /** Zipf-law fit of the corpus frequency spectrum: OLS of ln(count) on
    * ln(rank) over the top-`topN` vocabulary — the slope is the Zipf
    * exponent (≈ −1 for natural language; a spectrum that departs far
    * from it flags synthetic, boilerplate-heavy, or truncated corpora).
    * The corpus-health companion to [[graft.ext.TextStats]]' per-doc
    * gates, at corpus grain.
    *
    * Scale: the corpus reduces to the vocabulary ONCE ([[wordCounts]] —
    * the shuffle carries distinct words); `orderBy.limit` compiles to
    * TakeOrderedAndProject (bounded per-partition top-N, driver merge)
    * and the rank window runs over ≤ topN rows, never the corpus. The
    * regression is the closed-form fused aggregate (the q_corr_matrix
    * shape): exact DECIMAL(38,12) sums of the 6-dp-rounded logs, slope
    * evaluated on exact doubles with oracle-identical parenthesization. */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.Det.{dsumWide, Ols}
    val ranked = topK(docs, textCol, topN)
      .select(col("c"),
        row_number().over(Window.orderBy(col("c").desc, col("tok").asc))
          .as("rank"))
      .select(round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("c").cast("double")), 6).as("y"))
    val w = ranked.agg(
      count(lit(1)).as("n_terms"),
      dsumWide(col("x")).as("sx"),
      dsumWide(col("y")).as("sy"),
      dsumWide(col("x") * col("y")).as("sxy"),
      dsumWide(col("x") * col("x")).as("sxx"),
      dsumWide(col("y") * col("y")).as("syy"))
    w.select(col("n_terms"),
      Ols.slope(col("n_terms"), col("sx"), col("sy"), col("sxy"),
        col("sxx")).as("zipf_slope"),
      Ols.intercept(col("n_terms"), col("sx"), col("sy"), col("sxy"),
        col("sxx")).as("intercept"),
      Ols.r2(col("n_terms"), col("sx"), col("sy"), col("sxy"), col("sxx"),
        col("syy")).as("r2"))
  }

  /** word2vec-style frequency subsampling report (Mikolov et al. 2013,
    * "Distributed Representations of Words and Phrases", §2.3): each
    * occurrence of word w survives with probability
    * p_keep(w) = min(1, sqrt(t/f) + t/f) where f is w's corpus
    * frequency — aggressive down-sampling of "the"-class words that
    * dominate skip-gram windows without informing the embeddings. Per
    * retained-vocabulary word (count ≥ `minCount`): corpus count, f,
    * p_keep, and the count actually kept under the deterministic
    * per-occurrence md5 coin u(doc, pos, tok) < p_keep — the same
    * replayable-coin discipline as `ext_det_sample`, so the sampled
    * outcome itself is oracle-checkable, not just the probabilities.
    *
    * Scale: one explode + hash aggregate builds the (tok, c) vocabulary
    * (shuffle carries one row per DISTINCT word); the corpus total
    * rides a 1-row broadcast; the coin pass re-explodes and joins the
    * vocabulary on tok — vocabulary-sized build side, corpus streamed
    * map-side, one final hash aggregate back to word grain. No windows,
    * nothing driver-sized. */
  def subsampleReport(docs: DataFrame, textCol: String, idCol: String,
      t: Double, minCount: Long): DataFrame = {
    // one corpus pass: the vocabulary-sized count frame is persisted
    // (scope-released by the caller's action) and feeds BOTH the corpus
    // total and the retained-vocabulary slice
    val allCounts = graft.ops.CacheScope.persist(wordCounts(docs, textCol))
    val counts = allCounts.filter(col("c") >= minCount)
    val total = allCounts.agg(sum(col("c")).as("n_total"))
    // f and p_keep rounded at 6 dp BEFORE the coin compare — the
    // boundary u < p must test the same double on both engines
    val f = col("c").cast("double") / col("n_total").cast("double")
    val pKeep = round(least(lit(1.0),
      sqrt(lit(t) / f) + lit(t) / f), 6)
    val vocab = counts.crossJoin(broadcast(total))
      .select(col("tok"), col("c"), col("n_total"),
        round(f, 6).as("f"), pKeep.as("p_keep"))
    val occ = docs.select(col(idCol),
      posexplode(TextStats.tokens(lower(col(textCol))))
        .as(Seq("pos0", "tok")))
      // 1-based positions: DuckDB's generate_series replay is 1-based
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("tok"))
    val u = TextDedup.baseHash(concat_ws(":",
      col(idCol).cast("string"), col("pos").cast("string"), col("tok")))
      .cast("double") / lit(4294967296.0)
    occ.join(vocab, Seq("tok"))
      .select(col("tok"), col("c"), col("f"), col("p_keep"),
        (u < col("p_keep")).cast("long").as("kept"))
      .groupBy(col("tok"), col("c"), col("f"), col("p_keep"))
      .agg(sum(col("kept")).as("n_kept"))
      .select(col("tok"), col("c"), col("f"), col("p_keep"),
        col("n_kept"))
  }
}

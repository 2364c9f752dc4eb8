package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the corpus: BM25 (Robertson/Spärck Jones
  * probabilistic weighting, the Lucene `ln(1 + (N-df+0.5)/(df+0.5))`
  * non-negative idf variant).
  *
  * Scale (100 TB): per-doc term frequencies and document length are ONE
  * codegen'd projection pass (only `text` + key columns read); the corpus
  * statistics (N, Σdl, per-term df) are ONE wide aggregate producing a
  * single row that joins back as a broadcast — no per-term shuffle, no
  * inverted index materialization. The final top-k uses the bounded-heap
  * [[graft.functions.TopKAgg]], so partial aggregation shrinks candidates
  * to ≤k per partition map-side and no reducer ever sees the full scored
  * corpus.
  *
  * Determinism contract (DuckDB-oracle hash parity): the only
  * transcendental — each term's idf — is rounded to 6 dp before use, so a
  * last-ulp `ln` divergence between libm implementations cannot survive;
  * everything else is plain IEEE arithmetic evaluated in the same
  * left-associated order on both engines, and every constant is
  * interpolated from the SAME Scala double (shortest round-trip repr), so
  * the scores are bit-identical, not just close.
  */
object Retrieval {

  /** Per-term BM25 score columns for a doc frame that already carries
    * `dl` (doc length), `tf$i`, corpus stats `n_docs`, `sum_dl`, `df$i`. */
  private def termScore(i: Int, k1: Double, b: Double): Column = {
    val tf = col(s"tf$i").cast("double")
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf6 = round(
      log(lit(1.0) + (col("n_docs") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5))), 6)
    round(idf6 * (tf * lit(k1 + 1)) /
      (tf + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)), 6)
  }

  /** Global top-`k` documents by BM25 score for `queryTerms`.
    * Output: (idCol: long, score: double, rank: int), best-first. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = TextStats.tokens(lower(col(textCol)))
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"tf$i")
    }
    val withTf = docs.select(
      col(idCol) +: size(toks).as("dl") +: tfCols: _*)
    val stats = withTf.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("sum_dl") +:
        queryTerms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
    val score = queryTerms.indices.map(termScore(_, k1, b)).reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col(idCol).cast("long").as("id"),
        round(score, 6).as("score"))
      .groupBy()
      .agg(graft.functions.TopKAgg.top_k(col("score"), col("id"), k).as("tk"))
      .select(explode(col("tk")).as("t"))
      .select(col("t.id").as(idCol), col("t.score").as("score"),
        col("t.rank").as("rank"))
  }

  /** DuckDB oracle SQL for [[bm25TopK]] over the `documents` table —
    * generated from the same constants so every double literal
    * round-trips to the identical value. */
  def bm25OracleSql(queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val tfDefs = queryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x = '$t')) AS tf$i"
    }.mkString(",\n          ")
    val dfDefs = queryTerms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
    val terms = queryTerms.indices.map { i =>
      s"""round(round(ln(1.0 + (n_docs - df$i + 0.5) / (df$i + 0.5)), 6)
            * (tf$i * ${k1 + 1}) /
            (tf$i + $k1 * (${1 - b} + $b * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 6)"""
    }.mkString("\n          + ")
    s"""WITH tf AS (
        SELECT doc_id,
          len(string_split_regex(trim(lower(text)), '\\s+')) AS dl,
          $tfDefs
        FROM documents),
      st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfDefs FROM tf),
      sc AS (
        SELECT doc_id, round($terms, 6) AS score
        FROM tf, st)
      SELECT doc_id, score,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM sc ORDER BY score DESC, doc_id LIMIT $k"""
  }
}

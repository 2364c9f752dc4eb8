package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.10).
  *
  * Scale design (100 TB): brute-force top-k is the correctness baseline —
  * a broadcast of the (small) query set against the corpus, one pass, one
  * shuffle for the per-query top-k. The LSH-bucketed variant prunes the
  * corpus side by sign-bucket equality first, shrinking the candidate set
  * by ~2^bits before any dot product is computed; at cluster scale the
  * buckets also give the shuffle key for co-partitioned retrieval.
  *
  * All cosine values are computed in double and rounded to 6 dp; ordering
  * ties break on vec_id — so top-k is total-ordered and reproducible across
  * engines (float-sum association noise ~1e-13 ≪ the 1e-6 grain).
  */
object Similarity {

  /** Dot product of two float-array columns in double precision — the
    * native codegen'd expression (tight primitive loop, no per-row
    * allocation). Bit-identical to [[dotHof]]: same left-to-right double
    * summation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatVecDot.float_dot(a, b)

  /** Built-in-composed dot product (interpreted HOF path) — kept as the
    * reference implementation for arbitrary numeric arrays and for
    * differential testing against [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Per-query top-k over a scored (query_id, neighbor_id, cos) frame via
    * the bounded-heap aggregate [[graft.functions.TopKAgg]] — partial
    * aggregation shrinks candidates to ≤k per (query, partition) map-side,
    * so no single reducer ever sees the full scored corpus (the
    * `row_number().over(partitionBy(query_id))` form it replaces funneled
    * ALL scored rows through one task per query). Same total order as the
    * window form: cos desc (pre-rounded 6 dp), neighbor_id asc —
    * bit-identical results. */
  def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.top_k(
        col("cos"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("t"))
      .select(col("query_id"), col("t.id").as("neighbor_id"),
        col("t.score").as("cos"), col("t.rank").as("rank"))

  /** Brute-force top-k cosine neighbors for a query subset (`queryPred`
    * selects the query vectors, e.g. `vec_id < 8`). Excludes self-matches.
    */
  def bruteForceTopK(
      emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val scored = corpus.join(broadcast(queries),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    topKPerQuery(scored, k)
  }

  /** Sign-bucket key from the first `bits` dimensions: the trivial,
    * fully-deterministic LSH family (hyperplanes = coordinate axes). */
  def signBucket(emb: Column, bits: Int): Column =
    concat_ws("", (0 until bits).map(i =>
      when(element_at(emb, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** LSH-bucketed top-k: candidates restricted to the query's sign bucket.
    * Trades recall for a ~2^bits candidate reduction; the scale path. */
  def lshTopK(
      emb: DataFrame, queryPred: Column, k: Int, bits: Int = 8): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col("embedding"), bits))
    val queries = withBucket.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket"))
    val corpus = withBucket
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    topKPerQuery(scored, k)
  }

  /** Per-label centroids, emitted flat as (label, dim, value): posexplode →
    * grouped mean — one shuffle on (label, dim), no list-ordering
    * dependence in the result. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v").cast("double")), 6).as("centroid_v"))

  /** Embedding-cosine near-duplicate pairs within sign buckets: the
    * embedding-space analogue of MinHash near-dedup.
    *
    * Skew guard: real embeddings cluster, so one hot sign bucket can hold
    * a large fraction of the corpus and the within-bucket self-join
    * reverts to n² ON ONE TASK. A cheap per-bucket count (≤2^bits rows,
    * broadcast back) decides a salt factor `s = ⌈|bucket|/maxBucketRows⌉`;
    * the left side partitions its rows across `s` salts (`id mod s`) and
    * the right side replicates to every salt — the standard skew-join
    * replication, preserving EXACTLY the all-pairs-within-bucket result
    * while bounding per-task work to O(maxBucketRows·|bucket|) across `s`
    * parallel tasks instead of O(|bucket|²) on one. */
  def cosineNearDups(
      emb: DataFrame, threshold: Double, bits: Int = 8,
      maxBucketRows: Long = 100000L): DataFrame = {
    val withBucket = emb.withColumn("bucket", signBucket(col("embedding"), bits))
    val salts = withBucket.groupBy("bucket")
      .agg(ceil(count(lit(1)).cast("double") / maxBucketRows)
        .cast("int").as("nsalt"))
    val a = withBucket.join(broadcast(salts), Seq("bucket"))
      .select(col("bucket"),
        pmod(col("vec_id"), col("nsalt").cast("long")).cast("int").as("salt"),
        col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = withBucket.join(broadcast(salts), Seq("bucket"))
      .select(col("bucket"),
        explode(sequence(lit(0), col("nsalt") - 1)).as("salt"),
        col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("bucket", "salt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.10):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB):
  * - exact dedup = one hash-shuffle groupBy on a 16-byte digest, with
  *   map-side partial aggregation;
  * - MinHash/LSH = shingle → signature (one narrow pass), band →
  *   bucket-join (shuffle on band keys only, never all-pairs), exact
  *   Jaccard verify only on bucket collisions;
  * - n-gram Jaccard all-pairs is the *verification baseline* — its
  *   shingle-inverted-index join explodes quadratically per bucket and is
  *   only for modest corpora / final verification of LSH candidates;
  * - SimHash = per-doc 32-bit signature (one pass), near-dup = signatures
  *   at small Hamming distance.
  *
  * All hash functions are md5-based so every stage is reproducible in any
  * engine (and in the DuckDB oracle) — no engine-private hash.
  */
object TextDedup {

  /** Word n-gram shingles, de-duplicated per document. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextStats.tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Portable 32-bit hash of a shingle under seed `i`: first 8 hex chars of
    * md5("<seed>:<shingle>") as an unsigned long. */
  def seededHash(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 8), 16, 10)
      .cast("long")

  /** MinHash signature: for each of `k` seeds, the min seeded hash over the
    * document's shingles. One narrow projection, no shuffle. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = shingles(text, n)
    array((0 until k).map(seed =>
      array_min(transform(sh, s => seededHash(s, seed)))): _*)
  }

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`
    * values, each band rendered as "b:<v1>,<v2>" strings. Docs sharing any
    * band key are near-dup candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws(",",
        lit(b.toString),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Exact-dedup: group by content fingerprint; emit one representative
    * (min id) per distinct content + the duplicate count. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextStats.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("representative_id"),
        count(lit(1)).as("n_copies"))

  /** MinHash+LSH candidate pairs with exact Jaccard verification.
    * Returns (id_a, id_b, jaccard) for verified pairs ≥ `threshold`.
    *
    * Plan shape: project signatures → explode band keys → self-join on the
    * band key (the ONLY shuffle, sized by bucket collisions, not n²) →
    * distinct candidate pairs → exact Jaccard on the pair's shingle sets.
    */
  def minhashNearDups(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 8, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = k / bands
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"),
      minhashSignature(col(textCol), n, k).as("sig"))
    val banded = withSig
      .select(col("id"), col("sh"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("band"))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni",
        size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        round(col("inter") / col("uni").cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** All-pairs n-gram Jaccard over an inverted shingle index — the exact
    * baseline used to verify LSH recall (quadratic per shared shingle;
    * not the 100 TB path). */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.3): DataFrame = {
    val withSh = df.select(col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
    val inv = withSh.select(col("id"), col("sh"),
      explode(col("sh")).as("shingle"))
    val a = inv.select(col("shingle"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = inv.select(col("shingle"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(size(col("sh_a"))).as("size_a"),
        first(size(col("sh_b"))).as("size_b"))
      .withColumn("jaccard", round(col("inter")
        / (col("size_a") + col("size_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 32-bit SimHash signature: sign-sum of per-shingle hash bits. One
    * grouped pass (explode + sum per bit via bit arithmetic). */
  def simhash(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val bitSums = (0 until 32).map { j =>
      aggregate(sh, lit(0),
        (acc, s) => acc + when(
          shiftright(seededHash(s, 0), j).bitwiseAND(1) === 1, 1)
          .otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (bs, j) =>
      when(bs > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}

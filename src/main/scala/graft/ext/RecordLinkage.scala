package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-field record linkage (entity resolution) over structured
  * records: blocked candidate generation → edit-distance verification →
  * Fellegi–Sunter-style field-agreement scoring → transitive entity
  * clustering → golden-record survivorship. The classic customer-MDM
  * stack (Fellegi & Sunter 1969; Christen, "Data Matching", 2012),
  * re-expressed as Spark relational plans.
  *
  * Scale shape (the part that matters at 10⁹ records):
  *  - Candidates come ONLY from blocking-key equi-joins — never an
  *    all-pairs comparison. Each blocking key is a cheap deterministic
  *    projection whose granularity bounds block size (e.g. a name
  *    prefix that fixes all but the last two characters caps a block at
  *    the key's residual alphabet, independent of total row count), so
  *    candidate volume grows with Σ block², not n².
  *  - RECALL comes from running SEVERAL passes (multi-pass blocking,
  *    Hernández & Stolfo's insight): a true match missed by one key
  *    (a typo inside the key's span, an attribute that drifted across a
  *    bucket boundary) is caught by another. Passes are unioned and
  *    deduplicated on the pair id BEFORE the expensive verify, so each
  *    surviving pair pays exactly one edit-distance evaluation.
  *  - Verification uses the THRESHOLDED Levenshtein (early-exit DP,
  *    O(maxDist·len) not O(len²)) — same kernel as
  *    [[TextDedup]]'s fuzzy dedup.
  *  - Clustering reuses [[TextDedup.connectedComponents]]' pointer-jump
  *    min-label propagation (O(log diameter) rounds), so a chain of
  *    pairwise matches converges to one entity id without a driver loop.
  */
object RecordLinkage {

  /** Multi-pass blocked candidate pairs with thresholded edit-distance
    * verification. `blockKeys` are the per-pass blocking projections
    * (evaluated against `recs`); a pair is a candidate if ANY pass
    * co-blocks it. Returns `(id_a, id_b, name_dist)` with
    * `id_a < id_b` and `name_dist <= maxDist`.
    *
    * The pass index is part of the join key so two different passes can
    * never cross-match, and the `distinct()` on the pair runs BEFORE
    * the Levenshtein so multi-pass overlap costs one shuffle of ids,
    * not repeated DP verifications. */
  def blockedCandidates(recs: DataFrame, idCol: String, nameCol: String,
      blockKeys: Seq[Column], maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking pass")
    val keyed = blockKeys.zipWithIndex.map { case (k, i) =>
      recs.select(lit(i).as("bk_idx"), k.cast("string").as("bk"),
        col(idCol).cast("long").as("rid"), col(nameCol).as("nm"))
    }.reduce(_ unionAll _)
    val cand = keyed.as("a").join(keyed.as("b"),
        col("a.bk_idx") === col("b.bk_idx") &&
          col("a.bk") === col("b.bk") &&
          col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("id_a"), col("b.rid").as("id_b"),
        col("a.nm").as("nm_a"), col("b.nm").as("nm_b"))
      .distinct()
    cand
      .withColumn("name_dist",
        levenshtein(col("nm_a"), col("nm_b"), maxDist))
      .filter(col("name_dist").between(0, maxDist))
      .select("id_a", "id_b", "name_dist")
  }

  /** Join each side of a candidate-pair frame back to its record's
    * attributes: output keeps `(id_a, id_b, …pair cols)` and adds
    * `<attr>_a` / `<attr>_b` for every requested attribute. Two
    * id-keyed equi-joins against the (persisted, caller-scoped) record
    * frame — candidate-bounded, never a rescan per field. */
  def joinAttrs(pairs: DataFrame, recs: DataFrame, idCol: String,
      attrs: Seq[String]): DataFrame = {
    val ra = recs.select(col(idCol).cast("long").as("id_a") +:
      attrs.map(a => col(a).as(s"${a}_a")): _*)
    val rb = recs.select(col(idCol).cast("long").as("id_b") +:
      attrs.map(a => col(a).as(s"${a}_b")): _*)
    pairs.join(ra, Seq("id_a")).join(rb, Seq("id_b"))
  }
}

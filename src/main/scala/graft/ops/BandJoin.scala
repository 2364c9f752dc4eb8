package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (interval / range) join — pairs of rows whose numeric sort keys
  * lie within `tolerance` of each other. Spark plans a raw
  * `|a.t - b.t| <= tol` predicate as BroadcastNestedLoopJoin (all-pairs
  * — dead at any scale); the bucketed rewrite here turns it into ONE
  * equi-shuffle:
  *
  *   bucket = floor(key / tolerance); the LEFT side explodes to buckets
  *   {b-1, b, b+1}, the right side keeps its single bucket, and the
  *   equi-join on bucket is exact-complete: any pair within tolerance
  *   differs by at most one bucket, and since the right row occupies
  *   exactly one bucket each qualifying pair is produced EXACTLY once —
  *   no post-join dedup. A residual `abs(...) <= tol` filter drops the
  *   bucket-neighbors that are farther than the band.
  *
  * Cost: shuffle carries 3×|left| + |right| rows keyed by bucket; output
  * is only the genuine near-pairs. Skew follows the bucket histogram
  * (time-bucketed event data is near-uniform; a pathological hot bucket
  * can be salted like any hot join key).
  */
object BandJoin {

  /** Inner-join `left` × `right` on `|leftKey - rightKey| <= tolerance`
    * (keys in the same integer unit, e.g. epoch micros). All column
    * names must be disjoint between the two sides — both key columns
    * survive into the output; pre-rename as needed.
    *
    * `saltBuckets` > 1 engages hot-bucket salting (a flash-sale
    * timestamp pileup puts a large share of both sides into ONE bucket,
    * and the bucket equi-join then runs that bucket's cross product on
    * one task): each RIGHT row takes one deterministic salt —
    * `hash(all right columns) mod saltBuckets`, so identical keys with
    * distinct payloads still spread — and the LEFT side replicates its
    * 3 bucket copies across every salt. Each qualifying pair still
    * meets EXACTLY once (the right row owns exactly one (bucket, salt);
    * the left covers all of them), so salted ≡ unsalted row-for-row;
    * per-task work drops from O(|bucket|²) to O(|bucket|²/s) across s
    * parallel tasks, for a shuffle that carries 3s×|left| + |right|
    * rows. Salt only when the bucket histogram is actually hot — the
    * default 1 keeps the uniform-data shuffle minimal. */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, tolerance: Long,
      saltBuckets: Int = 1): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val collide = left.columns.toSet intersect right.columns.toSet
    require(collide.isEmpty, s"column names collide across sides: $collide")
    // integer `div`, never double division: epoch-micros keys (~1.7e18)
    // exceed double's 2^53 mantissa, and a bucket misassignment would
    // break the exactly-once pair guarantee. Keys must be non-negative
    // (div truncates toward zero).
    val lb = expr(s"`$leftKey` div $tolerance")
    val l0 = left.withColumn("__bucket",
      explode(array(lb - 1, lb, lb + 1)))
    val r0 = right.withColumn("__bucket",
      expr(s"`$rightKey` div $tolerance"))
    val (l, r, joinKeys) =
      if (saltBuckets == 1) (l0, r0, Seq("__bucket"))
      else (
        l0.withColumn("__salt",
          explode(sequence(lit(0), lit(saltBuckets - 1)))),
        r0.withColumn("__salt",
          pmod(hash(right.columns.map(qcol).toSeq: _*), lit(saltBuckets))),
        Seq("__bucket", "__salt"))
    l.join(r, joinKeys)
      .filter(abs(qcol(leftKey) - qcol(rightKey)) <= tolerance)
      .drop("__bucket", "__salt")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew-mitigation shape
  * for when AQE's runtime skew split cannot apply (e.g. the join feeds a
  * co-partitioned downstream op, or the skew is known up front).
  *
  * A plain shuffle join sends every row of a hot key to ONE task: with
  * 30% of a 100 TB fact on a single key, one straggler task processes
  * 30 TB while the rest of the cluster idles. Salting splits each key's
  * rows across `saltBuckets` tasks: the left (big, skewed) side gets a
  * deterministic salt from its own columns, the right side replicates
  * each row `saltBuckets` times so every (key, salt) bucket still finds
  * its match. Join semantics are EXACTLY those of the unsalted inner
  * join — verified by the `q_skew_salted_join` oracle, which states the
  * plain join.
  *
  * Trade: right-side rows are duplicated ×saltBuckets, so this fits a
  * moderate right side (too big to broadcast, far smaller than the
  * fact). For a broadcast-able right side, `broadcast()` already avoids
  * the skewed shuffle entirely — salting is the middle regime.
  */
object SkewJoin {

  /** Inner equi-join on `keys`, salted `saltBuckets` ways. `leftSaltCols`
    * supply the salt entropy (any columns that vary within a hot key —
    * a row id, a timestamp). Uses Spark's `hash` (engine-private is fine
    * here: the salt only balances partitions and cancels out of the join
    * result). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int, leftSaltCols: Seq[String]): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(leftSaltCols.nonEmpty, "need salt-entropy columns")
    val reserved = Seq("__salt")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      "__salt is reserved")
    val l = left.withColumn("__salt",
      pmod(hash(leftSaltCols.map(qcol): _*), lit(saltBuckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}

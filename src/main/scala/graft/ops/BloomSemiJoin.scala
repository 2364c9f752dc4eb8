package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** SEMI-JOIN REDUCTION via a Bloom bitmap — the classic 100 TB
  * shuffle-volume cut for a selective dim→fact join (Bloom 1970;
  * the sideways-information-passing / runtime-filter pattern of every
  * warehouse engine): compress the filtered dimension's join keys to a
  * few-KB bitmap, ship it to every fact task as ONE array literal, and
  * drop non-matching fact rows MAP-SIDE before any exchange. The exact
  * semi-join still runs afterwards, so the reduction is semantically
  * transparent: no false negatives by construction, and false positives
  * only admit rows the join then drops (output hash-identical to the
  * plain semi-join — the oracle states the plain form).
  *
  * Why not just broadcast the dim? When the filtered dim fits the
  * broadcast budget, Spark already builds a hash relation per task and
  * the bitmap saves little. The regime this targets is the one past
  * that budget: the semi-join becomes a shuffle of the FULL fact table
  * on the join key, while the bitmap stays a few KB regardless of dim
  * cardinality — the fact side arrives at the exchange already cut to
  * near-matches. AQE's own runtime filters cover only partitioned /
  * DPP-able scans; this works on any key column.
  */
object BloomSemiJoin {

  /** Fact rows whose `factKey` passes the Bloom membership test over
    * `dimKeys`, then exact-verified with a left-semi join. Output ≡
    * `fact SEMI JOIN dimKeys` row-for-row — which requires the
    * dim→fact key cast to be LOSSLESS: a narrowing cast (DECIMAL 5.50
    * → BIGINT 5) would make both the bitmap AND the exact verify
    * match fact rows a plain semi-join under Spark's own coercion
    * rejects, and the verify cannot rescue it because it joins on the
    * same cast values — so non-identical, non-widening key types are
    * rejected loudly here rather than silently redefining the join
    * (r11 ADVICE). */
  def prefilteredSemiJoin(fact: DataFrame, factKey: String,
      dimKeys: DataFrame, dimKey: String,
      mBits: Int = 1 << 16, numHashes: Int = 3): DataFrame = {
    val reserved = "__bm" +: (0 until numHashes).map(i => s"__p$i")
    require(!fact.columns.exists(reserved.contains),
      s"fact may not carry reserved columns ${reserved.mkString(", ")}")
    val factType = fact.schema(factKey).dataType
    val dimType = dimKeys.schema(dimKey).dataType
    // integral widths in bytes; only identical types or an integral
    // widening (every dim value representable in the fact type) keep
    // cast(dimKey -> factType) value-preserving
    def intWidth(dt: org.apache.spark.sql.types.DataType): Option[Int] =
      dt match {
        case org.apache.spark.sql.types.ByteType => Some(1)
        case org.apache.spark.sql.types.ShortType => Some(2)
        case org.apache.spark.sql.types.IntegerType => Some(4)
        case org.apache.spark.sql.types.LongType => Some(8)
        case _ => None
      }
    val lossless = dimType == factType ||
      ((intWidth(dimType), intWidth(factType)) match {
        case (Some(d), Some(f)) => d <= f
        case _ => false
      })
    require(lossless,
      s"prefilteredSemiJoin: dim key type $dimType does not cast " +
        s"losslessly to fact key type $factType — the bitmap and the " +
        "exact verify would both match on narrowed values, silently " +
        "redefining the semi-join; align the key types first")
    // the dim key is cast to the FACT key's type BEFORE rendering, so
    // the two sides hash identical strings even when the raw types
    // render differently (BIGINT 5 vs DECIMAL 5.00 — a rendered-form
    // mismatch would be a silent FALSE NEGATIVE, dropping matching
    // fact rows the exact join never gets to rescue); the same cast
    // feeds the join, aligning the verify with the bitmap
    val dimCast = dimKeys.select(col(dimKey).cast(factType).as(factKey))
    val dimStr = dimCast.select(col(factKey).cast("string").as("__k"))
    val bitmap = Sketches.bloomBitmap(dimStr, "__k", mBits, numHashes)
    val probed = fact
      .select((fact.columns.map(col) ++
        Sketches.cmsBuckets(col(factKey).cast("string"), numHashes, mBits)
          .zipWithIndex.map { case (c, i) => c.as(s"__p$i") }): _*)
      .withColumn("__bm", typedLit(bitmap.toSeq))
    probed
      .filter(Sketches.bloomMemberExpr("__bm",
        (0 until numHashes).map(i => s"__p$i")))
      .drop(reserved: _*)
      .join(dimCast.distinct(), Seq(factKey), "left_semi")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (mergeable-state) aggregation: compute per-epoch PARTIAL
  * states once, persist them, and fold new epochs in by merging states —
  * never rescanning history. This is the materialized-rollup pattern
  * every long-lived 100 TB pipeline ends up needing: day N's report is
  * `merge(stored partials, today's partial)` over key-grained rows,
  * while the naive form rescans N days of raw data.
  *
  * Every stat carried is chosen to be EXACTLY mergeable:
  *  - count/min/max — trivially associative;
  *  - sum — kept as DECIMAL(18,2) in the partial (decimal addition is
  *    exact and order-free; a double partial sum would make the merged
  *    total depend on epoch grouping);
  *  - distinct count — a [[graft.functions.KmvAgg]] KMV sketch (k
  *    smallest distinct hash values). KMV merges losslessly: the k
  *    smallest of a union are a subset of the union of per-epoch k
  *    smallest, so merged-sketch == direct-sketch, not approximately
  *    but identically. Spark's own HLL++ merges too but is
  *    implementation-defined; KMV is engine-reproducible.
  */
object IncrementalAgg {

  /** Per-(key, epoch) partial state for `valueCol` (numeric) and
    * `distinctHashCol` (pre-hashed values to distinct-count, e.g.
    * [[graft.ext.TextDedup.baseHash]] output). One hash aggregate;
    * output cardinality = keys × epochs. */
  def partials(df: DataFrame, keyCols: Seq[String], epochCol: String,
      valueCol: String, distinctHashCol: String, k: Int): DataFrame = {
    val v = qcol(valueCol)
    df.groupBy((keyCols :+ epochCol).map(qcol): _*)
      .agg(
        count(lit(1)).as("p_n"),
        sum(v.cast(DecimalType(18, 2))).as("p_sum"),
        min(v).as("p_min"), max(v).as("p_max"),
        graft.functions.KmvAgg.kmv_sketch(qcol(distinctHashCol), k)
          .as("p_kmv"))
  }

  /** Fold partial states down to per-key totals: exact n/sum/min/max,
    * KMV-estimated distinct count (`(k−1)/U(k)` on the merged sketch,
    * 6-dp rounded; exact size below k). Two small aggregates over the
    * partial frame (scalar fold + sketch re-fold over exploded sketch
    * values) joined on the keys — all key-grained, never row-grained. */
  def merge(partialFrame: DataFrame, keyCols: Seq[String],
      k: Int): DataFrame = {
    val keys: Seq[Column] = keyCols.map(qcol)
    val scalars = partialFrame.groupBy(keys: _*)
      .agg(
        sum(col("p_n")).as("n_rows"),
        sum(col("p_sum")).cast("double").as("total"),
        min(col("p_min")).as("v_min"), max(col("p_max")).as("v_max"))
    val sketches = partialFrame
      .select((keys :+ explode(col("p_kmv")).as("hv")): _*)
      .groupBy(keys: _*)
      .agg(graft.functions.KmvAgg.kmv_sketch(col("hv"), k).as("sk"))
      .select((keys :+ kmvEstimate(col("sk"), k).as("kmv_distinct")): _*)
    scalars.join(sketches, keyCols)
  }

  /** KMV estimate from a sketch column: exact size when the sketch never
    * filled, else `(k−1)/U(k)` with the k-th minimum rescaled to (0,1]
    * over the 32-bit hash space. Mirrors the `ext_kmv_distinct` oracle
    * expression term-for-term. */
  def kmvEstimate(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(lit((k - 1).toDouble) /
        ((element_at(sk, k) + 1) / lit(4294967296.0)), 6))

  /** The HLL α_m bias constant (Flajolet et al. 2007, Fig. 3). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** The 32-bit hash space the portable md5 hash draws from (2^32). */
  val hllHashSpace: Double = 4294967296.0

  /** Large-range switch point: raw > 2^32/30 (Flajolet et al. 2007 §4,
    * 32-bit regime) means hash-space birthday collisions bias raw low. */
  val hllLargeRangeThreshold: Double = hllHashSpace / 30.0

  /** HLL estimate from a [[graft.functions.HllAgg]] register array:
    * raw = α_m·m² / Σ 2^(−M_j), with the standard small-range switch to
    * linear counting m·ln(m/V) when raw ≤ 2.5m and V (empty registers)
    * > 0, and the standard 32-bit LARGE-range correction
    * −2^32·ln(1 − raw/2^32) when raw > 2^32/30 — beyond that point the
    * 32-bit hash space itself saturates (birthday collisions), which is
    * the accuracy ceiling of any estimator over a 32-bit hash: past
    * ~10^8 distinct values the corrected estimate still degrades as
    * raw → 2^32. For manifest-scale counts beyond ~10^8, shard the key
    * space (e.g. per-source sketches summed) or accept ~% -level bias.
    * `raw` is clamped to 2^32−1 before the ln on BOTH engines: at
    * near-fully-saturated registers raw can exceed 2^32 (raw_max ≈
    * 6.2e9 for p=8), where the unclamped argument goes non-positive —
    * Spark log() would return NULL while DuckDB ln() aborts the query,
    * breaking the engine-identical contract exactly at saturation; the
    * clamp makes both return the same finite saturated estimate.
    * Mirrors the `ext_hll_distinct` / `ext_hll_merge_epochs` oracles
    * term-for-term via [[hllEstimateSql]].
    *
    * Portability: every 2^(−M) term is an exact power of two and the sum
    * spans < 53 bits, so Σ is the SAME double in any accumulation order
    * (engine-independent); α_m·m² is interpolated from one Scala double
    * into both engines; ln() (the only libm call, in the linear-counting
    * and large-range branches) is 6-dp rounded before the multiply. */
  def hllEstimate(registers: Column, p: Int): Column = {
    val m = 1 << p
    val am2 = hllAlpha(m) * m * m
    val s = aggregate(registers, lit(0.0),
      (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
    val v = size(filter(registers, _ === 0))
    val raw = lit(am2) / s
    when(raw <= lit(2.5 * m) && v > 0,
      round(lit(m.toDouble) *
        round(log(lit(m.toDouble) / v.cast("double")), 6), 6))
      .otherwise(when(raw > lit(hllLargeRangeThreshold),
        round(lit(-hllHashSpace) *
          round(log(lit(1.0) -
            least(raw, lit(hllHashSpace - 1.0)) / lit(hllHashSpace)), 6), 6))
        .otherwise(round(raw, 6)))
  }

  /** The DuckDB replay of [[hllEstimate]], generated from the SAME Scala
    * constants so the two engines cannot drift: `s` names the register
    * sum Σ 2^(−M_j) column/expression, `v` the empty-register count. */
  def hllEstimateSql(s: String, v: String, p: Int): String = {
    val m = 1 << p
    val am2 = hllAlpha(m) * m * m
    s"""CASE WHEN ($am2 / $s) <= ${2.5 * m} AND $v > 0
      THEN round(${m.toDouble} * round(ln(${m.toDouble} / $v), 6), 6)
      WHEN ($am2 / $s) > $hllLargeRangeThreshold
      THEN round(${-hllHashSpace}
        * round(ln(1.0 - least(($am2 / $s), ${hllHashSpace - 1.0})
          / $hllHashSpace), 6), 6)
      ELSE round($am2 / $s, 6) END"""
  }
}

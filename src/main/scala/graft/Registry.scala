package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark plan plus (optionally) the equivalent DuckDB
  * SQL the driver runs as the correctness oracle. `bench = true` marks the
  * headline queries timed by [[Bench]].
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Determinism helpers for DuckDB-oracle hash parity.
  *
  * Double summation is order-dependent, and Spark/DuckDB aggregate in
  * different orders — so any aggregated money/ratio column goes through an
  * EXACT decimal sum and is cast back to double at the very end. The
  * double→decimal rounding per row is identical in both engines
  * (round-half-away-from-zero on the same IEEE double), and decimal addition
  * is exact, so the final double is bit-identical.
  *
  * Timestamps are never emitted raw: Spark writes tz-aware parquet
  * timestamps while DuckDB produces naive ones — formatted strings or DATEs
  * only.
  */
object Det {
  /** Exact decimal sum of a double column, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum / count. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(lit(1))

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) / count(*)"
}

/** Central query inventory. SparkEntry exposes it in the driver's shape. */
object Registry {
  def all: Seq[Q] =
    AnalyticsQueries.all ++ RetailQueries.all ++ ParityQueries.all ++
      ExtQueries.all ++ ExtQueries2.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

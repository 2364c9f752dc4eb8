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

  /** Wide exact sum for second-order statistics (products of 6-dp logs /
    * ratios): DECIMAL(38,12) holds the per-row double→decimal rounding
    * exactly and the sum never overflows at any realistic count. One
    * definition for every fused-OLS/variance site — hand-maintained
    * copies were the oracle-drift bug class. */
  def dsumWide(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  def dsumWideSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(38,12))) AS DOUBLE)"

  /** Closed-form OLS from fused sums — slope/intercept/r², identical
    * parenthesization in the Column and SQL forms so the two engines
    * evaluate the same IEEE tree (shared by q_price_elasticity and
    * ext_zipf_fit). All inputs are the exact-decimal-derived doubles of
    * [[dsumWide]]; outputs round 6 dp. */
  object Ols {
    def slope(n: Column, sx: Column, sy: Column, sxy: Column,
        sxx: Column): Column =
      round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)

    def intercept(n: Column, sx: Column, sy: Column, sxy: Column,
        sxx: Column): Column =
      round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)

    def r2(n: Column, sx: Column, sy: Column, sxy: Column, sxx: Column,
        syy: Column): Column =
      round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)

    def slopeSql(n: String, sx: String, sy: String, sxy: String,
        sxx: String): String =
      s"round(($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx), 6)"

    def interceptSql(n: String, sx: String, sy: String, sxy: String,
        sxx: String): String =
      s"round(($sy - (($n * $sxy - $sx * $sy) / ($n * $sxx - $sx * $sx)) " +
        s"* $sx) / $n, 6)"

    def r2Sql(n: String, sx: String, sy: String, sxy: String, sxx: String,
        syy: String): String =
      s"round((($n * $sxy - $sx * $sy) * ($n * $sxy - $sx * $sy)) " +
        s"/ (($n * $sxx - $sx * $sx) * ($n * $syy - $sy * $sy)), 6)"
  }
}

/** Central query inventory. SparkEntry exposes it in the driver's shape. */
object Registry {
  def all: Seq[Q] =
    AnalyticsQueries.all ++ AnalyticsQueries2.all ++ RetailQueries.all ++
      ParityQueries.all ++ ExtQueries.all ++ ExtQueries2.all ++
      ExtQueries3.all ++ UnigramQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

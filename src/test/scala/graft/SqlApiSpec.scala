package graft

import org.apache.spark.sql.functions._

/** SQL entry-point surface: the engine is usable through `spark.sql`
  * over registered views, not only the DataFrame API — the same logical
  * plans, so results must match the DataFrame form row-for-row. (The
  * oracle gate exercises the DuckDB dialect; this spec exercises the
  * SPARK dialect of the same queries.)
  */
class SqlApiSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def registerViews(): Unit =
    Tables.names.foreach { n =>
      Tables.load(spark, sf, n).createOrReplaceTempView(n)
    }

  private def hash(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.mkString("|")).toSeq.sorted
  }

  test("spark.sql pricing summary == DataFrame q1_pricing_summary") {
    registerViews()
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
          AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          / count(*) AS avg_price,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus""")
    assert(hash(sql) == hash(AnalyticsQueries.q1Pricing.run(spark, sf)))
  }

  test("spark.sql anti join == DataFrame q_orders_without_lineitems") {
    registerViews()
    val sql = spark.sql("""
      SELECT o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey NOT IN
        (SELECT l_orderkey FROM lineitem)""")
    val df = Registry.queries("q_orders_without_lineitems")(spark, sf)
    assert(hash(sql) == hash(df))
  }

  test("spark.sql window rank == DataFrame q_window_top_order_per_customer") {
    registerViews()
    val sql = spark.sql("""
      WITH r AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      SELECT o_custkey, o_orderkey, o_totalprice, rn
      FROM r WHERE rn <= 3""")
    val df = Registry.queries("q_window_top_order_per_customer")(spark, sf)
    // same row set on the shared columns
    val sqlKeys = sql.select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfKeys = df.select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sqlKeys == dfKeys)
  }
}

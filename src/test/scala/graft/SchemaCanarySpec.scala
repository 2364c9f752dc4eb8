package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema-drift canary for the driver-generated testdata.
  *
  * The driver regenerates /root/testdata between rounds and physical types
  * have drifted before (round 4: events.ts TIMESTAMP(NANOS) → timestamp[us],
  * which silently knocked out 15 queries and 6 specs). This suite loads every
  * table through its [[Tables]] loader at sf0.001 and asserts the column
  * set and types, so the NEXT regeneration fails here with one clear
  * message per table instead of scattered analysis errors deep inside
  * query plans.
  *
  * Timestamp-bearing raw columns are pinned as "some timestamp flavor"
  * (LTZ or NTZ — both have drifted historically and downstream code
  * tolerates either under the UTC session timezone); everything else is
  * pinned exactly. events.ts is pinned strictly to TimestampType because
  * the loader's contract is to NORMALIZE whatever the file carries.
  */
class SchemaCanarySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** expected: column name → either an exact DataType, or None meaning
    * "any timestamp flavor" (TimestampType | TimestampNTZType). */
  private def check(table: String, df: => DataFrame,
      expected: Seq[(String, Option[DataType])]): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType)
    val actualNames = actual.map(_._1)
    assert(actualNames == expected.map(_._1),
      s"[$table] column drift — testdata was likely regenerated with a new " +
        s"layout.\n  expected: ${expected.map(_._1).mkString(", ")}\n  " +
        s"actual:   ${actualNames.mkString(", ")}")
    actual.zip(expected).foreach { case ((name, dt), (_, exp)) =>
      exp match {
        case Some(e) => assert(dt == e,
          s"[$table.$name] type drift: expected ${e.simpleString}, got " +
            s"${dt.simpleString} — testdata was likely regenerated; adapt " +
            s"the ${table} loader (Tables.scala) like the round-5 events fix.")
        case None => assert(
          dt == TimestampType || dt == TimestampNTZType,
          s"[$table.$name] type drift: expected a timestamp flavor, got " +
            s"${dt.simpleString} — adapt the ${table} loader (Tables.scala).")
      }
    }
  }

  private def exact(pairs: (String, DataType)*): Seq[(String, Option[DataType])] =
    pairs.map { case (n, t) => n -> Some(t) }

  test("canary: region") {
    check("region", Tables.region(spark, sf),
      exact("r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("canary: nation") {
    check("nation", Tables.nation(spark, sf),
      exact("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType))
  }

  test("canary: customer") {
    check("customer", Tables.customer(spark, sf),
      exact("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType))
  }

  test("canary: supplier") {
    check("supplier", Tables.supplier(spark, sf),
      exact("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
  }

  test("canary: part") {
    check("part", Tables.part(spark, sf),
      exact("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("canary: orders") {
    check("orders", Tables.orders(spark, sf), Seq(
      "o_orderkey" -> Some(LongType), "o_custkey" -> Some(LongType),
      "o_orderstatus" -> Some(StringType), "o_totalprice" -> Some(DoubleType),
      "o_orderdate" -> None, "o_orderpriority" -> Some(StringType)))
  }

  test("canary: lineitem") {
    check("lineitem", Tables.lineitem(spark, sf), Seq(
      "l_orderkey" -> Some(LongType), "l_partkey" -> Some(LongType),
      "l_suppkey" -> Some(LongType), "l_linenumber" -> Some(IntegerType),
      "l_quantity" -> Some(DoubleType), "l_extendedprice" -> Some(DoubleType),
      "l_discount" -> Some(DoubleType), "l_tax" -> Some(DoubleType),
      "l_returnflag" -> Some(StringType), "l_linestatus" -> Some(StringType),
      "l_shipdate" -> None))
  }

  test("canary: events — loader must normalize ts to TimestampType") {
    check("events", Tables.events(spark, sf), exact(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
  }

  test("canary: documents") {
    check("documents", Tables.documents(spark, sf),
      exact("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType,
        "n_chars" -> LongType))
  }

  test("canary: embeddings") {
    check("embeddings", Tables.embeddings(spark, sf),
      exact("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))
  }

  test("canary: events values survive the normalization (non-null, sane epoch)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val row = ev.agg(
      count(lit(1)).as("n"),
      sum(col("ts").isNull.cast("long")).as("nulls"),
      min(year(col("ts"))).as("ymin"),
      max(year(col("ts"))).as("ymax")).head()
    assert(row.getLong(0) > 0, "[events] table is empty")
    assert(row.getLong(1) == 0, "[events] ts has nulls after normalization")
    val (ymin, ymax) = (row.getInt(2), row.getInt(3))
    assert(ymin >= 1990 && ymax <= 2100,
      s"[events] ts years out of sane range ($ymin..$ymax) — unit botch " +
        "(nanos/micros/millis) in the loader normalization?")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Cleaners
import graft.sources.CsvSource

/** End-to-end golden tests for the three cleaning pipelines over
  * reference-shaped messy CSV fixtures (FIXTURES.md §A). */
class CleanersSpec extends SparkSpec {

  lazy val amazon = CsvSource.read(spark,
    TestSpark.fixture("Amazon Sale Report_2022-04-30_10-00-00.csv"))
  lazy val sale = CsvSource.read(spark,
    TestSpark.fixture("Sale Report_2022-04-30_10-00-00.csv"))
  lazy val intl = CsvSource.read(spark,
    TestSpark.fixture("International Sale Report_2022-04-30_10-00-00.csv"))

  test("clean_amazon: D1 dedup, P4 blank-row drop, P5 critical drop, D2 split") {
    val (clean, flagged) = Cleaners.amazon(amazon)
    val cleanRows = clean.collect()
    // 13 raw - 1 exact dup - 1 mostly-blank - 1 critical-null - 2 conflicting
    assert(cleanRows.length == 8)
    assert(flagged.count() == 2)
    assert(flagged.select("order_id").distinct.collect()
      .map(_.getString(0)).toSet == Set("171-5057375-2831560"))
  }

  test("clean_amazon: noisy columns dropped, renames applied") {
    val (clean, _) = Cleaners.amazon(amazon)
    val cols = clean.columns.toSet
    assert(!cols.contains("style") && !cols.contains("currency")
      && !cols.contains("unnamed:_22") && !cols.contains("promotion_ids"))
    assert(cols.contains("fulfillment") && cols.contains("quantity"))
  }

  test("clean_amazon: F6 currency scrub with 90% adoption + F4 date parse") {
    val (clean, _) = Cleaners.amazon(amazon)
    val byId = clean.collect().map(r =>
      r.getAs[String]("order_id") -> r).toMap
    val r0 = byId("405-8078784-5731545")
    assert(r0.getAs[Double]("amount") == 647.62) // "$647.62"
    assert(r0.getAs[String]("date") == "2022-04-30") // "04-30-22"
    // "(399.00)" → parens stripped, NOT negated (reference scrub semantics)
    assert(byId("406-7807733-3785945").getAs[Double]("amount") == 399.0)
    // "1 198.00" → internal space stripped
    assert(byId("402-4393761-0311520").getAs[Double]("amount") == 1198.0)
  }

  test("clean_amazon: F2 lowercases status pre-rename; F7 sentinels null b2b") {
    val (clean, _) = Cleaners.amazon(amazon)
    val byId = clean.collect().map(r =>
      r.getAs[String]("order_id") -> r).toMap
    assert(byId("171-9198151-1101146").getAs[String]("status") == "shipped")
    assert(byId("407-5633625-6970741").getAs[String]("b2b") == null) // "n/a"
  }

  test("clean_sale: dedup, index drop, design_no rename, 90% rule NOT met") {
    val out = Cleaners.sale(sale)
    val rows = out.collect()
    assert(rows.length == 5) // 7 raw - 1 dup - 1 blank
    assert(out.columns.contains("design_no") && !out.columns.contains("index"))
    // stock: 4/5 numeric = 80% < 90% → stays string, 'NA' → null
    val stock = rows.map(_.getAs[String]("stock")).toSet
    assert(stock.contains("5.0") && stock.contains(null))
    // " BL001-BLUE-XL " stripped and uppercased? sale has no F1 — strip only
    assert(rows.map(_.getAs[String]("sku_code")).contains("BL001-BLUE-XL"))
  }

  test("clean_international: O1 split, month strategies, F1 standardize") {
    val (part1, part2) = Cleaners.international(intl)
    val p1rows = part1.orderBy("sku").collect()
    assert(p1rows.length == 4)
    assert(part2.count() == 3)
    // part2 re-headered from the embedded header row, gross_amt→gross_amount
    assert(part2.columns.toSet == Set("date", "months", "customer", "style",
      "sku", "size", "pcs", "rate", "gross_amount"))
    // months strategy A (MMM-yy parseable): Jun-21→June, bare 'jun'→null
    val months1 = part1.select("months").collect().map(_.getString(0))
    assert(months1.count(_ == "June") == 3 && months1.count(_ == null) == 1)
    val months2 = part2.select("months").collect().map(_.getString(0))
    assert(months2.count(_ == "July") == 2 && months2.count(_ == null) == 1)
    // F6 in part2: "1,672.94" → 1672.94
    val gross2 = part2.select("gross_amount").collect().map(_.getDouble(0)).toSet
    assert(gross2 == Set(836.47, 1672.94, 1024.0))
    // F4: 06-05-21 → 2021-06-05
    assert(p1rows.map(_.getAs[String]("date")).forall(_ == "2021-06-05"))
    // F1: customer/style/sku/size uppercased
    assert(p1rows.map(_.getAs[String]("customer"))
      .forall(c => c == c.toUpperCase))
  }

  test("clean_international: no embedded header → everything part1") {
    val noPivot = intl.filter(
      !col("CUSTOMER").rlike("^[A-Z ]+$") || col("CUSTOMER") =!= "CUSTOMER")
      .filter(col("index") < 4)
    val (part1, part2) = Cleaners.international(noPivot)
    assert(part1.count() == 4)
    assert(part2.count() == 0)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.app.BatchMain
import graft.sources.CsvSource
import graft.streaming.StreamPipeline

/** Streaming + batch-driver end-to-end specs (SURVEY.md §2.8, §3.2). */
class StreamingSpec extends SparkSpec {

  test("file-source stream: amazon fixture cleaned exactly-once") {
    val landing = Files.createTempDirectory("landing").toFile
    val out = Files.createTempDirectory("out").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    val fixture = new java.io.File(
      TestSpark.fixture("Amazon Sale Report_2022-04-30_10-00-00.csv"))
    java.nio.file.Files.copy(fixture.toPath,
      new java.io.File(landing, fixture.getName).toPath)

    val schema = CsvSource.read(spark, fixture.getPath).schema
    val raw = StreamPipeline.fileStream(spark, landing.toString, schema,
      glob = "Amazon*.csv")
    val q = StreamPipeline.cleanClassStream(raw, CsvSource.AmazonSale,
      out, ckpt)
    q.awaitTermination(120000)

    val cleaned = spark.read.option("header", "true")
      .csv(s"$out/batch_0/amazon_sale")
    assert(cleaned.count() == 8)
    val flagged = spark.read.option("header", "true")
      .csv(s"$out/batch_0/amazon_sale_duplicates")
    assert(flagged.count() == 2)

    // restart over the same checkpoint: no new batch output (exactly-once)
    val raw2 = StreamPipeline.fileStream(spark, landing.toString, schema,
      glob = "Amazon*.csv")
    val q2 = StreamPipeline.cleanClassStream(raw2, CsvSource.AmazonSale,
      out, ckpt)
    q2.awaitTermination(120000)
    assert(!new java.io.File(s"$out/batch_1").exists())
  }

  test("events windowed agg with watermark matches batch computation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // batch form of the same plan (streaming-specific parts removed)
    val expected = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .count()
    val got = StreamPipeline.eventsWindowed(events, "1 hour", "2 hours")
    assert(got.count() == expected)
  }

  test("BatchMain: routes all three classes + skips unrecognized") {
    val landing = Files.createTempDirectory("landing2").toFile
    val out = Files.createTempDirectory("out2").toString
    Seq("Amazon Sale Report_2022-04-30_10-00-00.csv",
      "Sale Report_2022-04-30_10-00-00.csv",
      "International Sale Report_2022-04-30_10-00-00.csv").foreach { n =>
      java.nio.file.Files.copy(
        new java.io.File(TestSpark.fixture(n)).toPath,
        new java.io.File(landing, n).toPath)
    }
    java.nio.file.Files.writeString(
      new java.io.File(landing, "inventory sale notes.txt").toPath, "x")

    BatchMain.run(spark, landing.toString, out, None)

    def readOut(sub: String) =
      spark.read.option("header", "true").csv(s"$out/$sub")
    assert(readOut("amazon_sale").count() == 8)
    assert(readOut("amazon_sale_duplicates").count() == 2)
    assert(readOut("sale").count() == 5)
    assert(readOut("international_1").count() == 4)
    assert(readOut("international_2").count() == 3)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ext.{ArchiveIndex, TextDedup}

/** The unified archive-index artifact (r11 VERDICT #5): one on-disk
  * format the batch incremental build, the streaming grow+prune
  * capstone, and the corpus-DQ monitor all consume — these tests pin
  * the batch↔stream interchangeability that unification promises. */
class ArchiveIndexSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(); ()
  }

  private val archiveRows = Seq(
    (2L, "alpha beta gamma delta epsilon zeta eta"),
    (4L, "one two three four five six seven eight"),
    (6L, "alpha beta gamma delta epsilon zeta eta"), // exact dup of 2
    (8L, "lorem ipsum dolor sit amet consectetur adipiscing"))

  test("round-trip: fp/ib/ih read back equal the session-frame builds; " +
      "the layout file self-describes nBuckets") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-spec")
    try {
      ArchiveIndex.write(archive, "text", "id", nBuckets = 8,
        base.toString)
      assert(ArchiveIndex.nBuckets(spark, base.toString) == 8)
      val fpDisk = ArchiveIndex.readFp(spark, base.toString)
        .collect().map(r => (r.get(0).toString, r.getLong(1),
          r.getLong(2))).toSet
      val fpMem = TextDedup.exactDedup(archive, "text", "id")
        .collect().map(r => (r.get(0).toString, r.getLong(1),
          r.getLong(2))).toSet
      assert(fpDisk == fpMem, "fp table drifted through the format")
      val (ibMem, ihMem) = TextDedup.lshIndex(archive, "text", "id")
      assert(ArchiveIndex.readBands(spark, base.toString)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        ibMem.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
      assert(ArchiveIndex.readHashes(spark, base.toString)
        .collect().map(r => (r.getLong(0),
          r.getSeq[Long](1).mkString(","))).toSet ==
        ihMem.collect().map(r => (r.getLong(0),
          r.getSeq[Long](1).mkString(","))).toSet)
    } finally rm(base.toFile)
  }

  test("batch-built artifact probed by the STREAM equals the batch " +
      "probe; stream-grown artifact probed by BATCH sees the growth") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-xspec")
    try {
      val idx = s"$base/idx"
      ArchiveIndex.write(archive, "text", "id", nBuckets = 16, idx)
      // batch → stream: the capstone probes the batch-written artifact
      val waves = Seq(
        Seq((101L, "alpha beta gamma delta epsilon zeta eta theta")),
        Seq((201L, "red orange yellow green blue indigo violet")),
        Seq((301L, "red orange yellow green blue indigo violet crimson")))
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = graft.streaming.StreamPipeline.lshDedupGrowPrunedStart(
        in.toDF.toDF("id", "text"), threshold = 0.5, nBuckets = 16,
        s"$base/pairs", ArchiveIndex.ibDir(idx), ArchiveIndex.ihDir(idx),
        s"$base/ckpt", availableNow = false)
      try {
        waves.foreach { w => in.addData(w: _*); q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.read.parquet(s"$base/pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      // wave 1 matches the batch-written archive (101 ~ 2 and its dup
      // 6); wave 3 matches wave 1's NOVEL doc only via stream growth
      assert(streamed.exists(p => p._1 == 101L && p._2 == 2L))
      assert(streamed.exists(p => p._1 == 301L && p._2 == 201L))
      // stream → batch: a batch probe of the GROWN artifact (read back
      // through the unified readers) must see the stream's appends —
      // 401 is a near-dup of streamed doc 301, absent from the
      // batch-written seed
      val probe = Seq((401L,
        "red orange yellow green blue indigo violet crimson extra"))
        .toDF("id", "text")
      val got = TextDedup.incrementalLshPairs(probe, "text", "id",
          ArchiveIndex.readBands(spark, idx),
          ArchiveIndex.readHashes(spark, idx), threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((401L, 301L)),
        s"batch probe must see the stream-appended doc 301: $got")
    } finally rm(base.toFile)
  }

  test("compact(): all three tables reach the packed floor with content " +
      "untouched") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-cspec")
    try {
      val idx = base.toString
      ArchiveIndex.write(archive, "text", "id", nBuckets = 8, idx)
      // simulate the stream's append traffic on all three tables
      val more = Seq((10L, "nine ten eleven twelve thirteen fourteen"))
        .toDF("id", "text")
      ArchiveIndex.appendBucketedTable(
        TextDedup.exactDedup(more, "text", "id"), "fp",
        ArchiveIndex.fpDir(idx), 8)
      val (mb, mh) = TextDedup.lshIndex(more, "text", "id")
      ArchiveIndex.appendBucketedTable(mb, "band",
        ArchiveIndex.ibDir(idx), 8)
      ArchiveIndex.appendBucketedTable(mh, "id",
        ArchiveIndex.ihDir(idx), 8)
      def snapshot() = (
        ArchiveIndex.readFp(spark, idx).collect()
          .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet,
        ArchiveIndex.readBands(spark, idx).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet,
        ArchiveIndex.readHashes(spark, idx).collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).mkString(","))).toSet)
      val before = snapshot()
      ArchiveIndex.compact(spark, idx)
      assert(snapshot() == before, "compaction altered index content")
      // packed floor: one data file per bucket dir in every table
      Seq(ArchiveIndex.fpDir(idx), ArchiveIndex.ibDir(idx),
          ArchiveIndex.ihDir(idx)).foreach { d =>
        Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("bkt=")).foreach { b =>
            val n = Option(b.listFiles()).getOrElse(Array.empty)
              .count(_.getName.endsWith(".parquet"))
            assert(n == 1, s"${b.getPath}: $n files after compaction")
          }
      }
    } finally rm(base.toFile)
  }
}

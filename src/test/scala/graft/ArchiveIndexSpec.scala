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

  test("snapshot isolation: a reader resolved BEFORE the compaction " +
      "commit completes against the old snapshot; one resolved AFTER " +
      "sees only the packed set; grace-expired files are GC'd") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-snap")
    try {
      val idx = base.toString
      ArchiveIndex.write(archive, "text", "id", nBuckets = 8, idx)
      val more = Seq((10L, "nine ten eleven twelve thirteen fourteen"))
        .toDF("id", "text")
      ArchiveIndex.appendBucketedTable(
        TextDedup.exactDedup(more, "text", "id"), "fp",
        ArchiveIndex.fpDir(idx), 8)
      def fpSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      // resolve-before-commit: this frame's file index is pinned to the
      // pre-compaction snapshot at creation time
      val early = ArchiveIndex.readFp(spark, idx)
      val want = fpSet(early)
      // compact with a large grace: old generation must SURVIVE on disk
      ArchiveIndex.compact(spark, idx, gcGraceMs = 24L * 3600 * 1000)
      assert(fpSet(early) == want,
        "pre-commit reader failed or drifted mid-compaction")
      // resolve-after-commit: identical content through the new snapshot
      assert(fpSet(ArchiveIndex.readFp(spark, idx)) == want,
        "post-commit reader drifted")
      // superseded generation is still present inside the grace window…
      val fpd = ArchiveIndex.fpDir(idx)
      def dataFiles() =
        Option(new java.io.File(fpd).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("bkt="))
          .flatMap(b => Option(b.listFiles()).getOrElse(Array.empty))
          .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      assert(dataFiles().exists(!_.startsWith("g")),
        "old generation GC'd inside the grace window")
      // …and gone after a grace-0 GC pass, with content intact
      ArchiveIndex.gcUnreferenced(spark, fpd, gcGraceMs = 0L)
      assert(dataFiles().forall(_.startsWith("g")),
        s"unreferenced files survived a grace-0 GC: ${dataFiles()}")
      assert(fpSet(ArchiveIndex.readFp(spark, idx)) == want)
    } finally rm(base.toFile)
  }

  test("orphans from a crashed append are invisible, never adopted, " +
      "and GC'd; legacy manifest-less dirs are adopted on compact") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-orph")
    try {
      // legacy dir: raw bucket-partitioned parquet, NO manifest
      val legacy = s"$base/legacy"
      TextDedup.exactDedup(archive, "text", "id")
        .withColumn("bkt", pmod(xxhash64(col("fp")), lit(8)))
        .write.partitionBy("bkt").parquet(legacy)
      def fpSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      val want = fpSet(ArchiveIndex.readBucketedTable(spark, legacy)
        .select("fp", "representative_id", "n_copies"))
      ArchiveIndex.compactBucketedDir(spark, legacy) // adopts, then packs
      assert(fpSet(ArchiveIndex.readBucketedTable(spark, legacy)
        .select("fp", "representative_id", "n_copies")) == want,
        "legacy adoption changed content")
      // orphan: simulate a crash between data write and manifest commit
      // by planting a stray parquet file no manifest references
      val bkts = new java.io.File(legacy).listFiles()
        .filter(_.getName.startsWith("bkt="))
      val donor = bkts.head.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val orphan = new java.io.File(bkts.head, "orphan-crash.parquet")
      java.nio.file.Files.copy(donor.toPath, orphan.toPath)
      assert(fpSet(ArchiveIndex.readBucketedTable(spark, legacy)
        .select("fp", "representative_id", "n_copies")) == want,
        "reader saw a file outside the manifest snapshot")
      // an append must not adopt the orphan either
      ArchiveIndex.appendBucketedTable(
        TextDedup.exactDedup(
          Seq((20L, "twenty one two three")).toDF("id", "text"),
          "text", "id"), "fp", legacy, 8)
      val manifested = ArchiveIndex.currentManifest(spark, legacy).get
      assert(!manifested.exists(_.contains("orphan-crash")),
        "append adopted a crashed write's orphan file")
      ArchiveIndex.gcUnreferenced(spark, legacy, gcGraceMs = 0L)
      assert(!orphan.exists(), "GC left the orphan on disk")
    } finally rm(base.toFile)
  }

  test("STREAM-committed artifact probed by BATCH: a wave's commit " +
      "lands fp rows that drop the next wave's exact copies, and a " +
      "batch probe of the grown fp table sees the streamed survivors") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val archive = archiveRows.toDF("id", "text")
      .select(col("id").as("doc_id"), col("text"),
        lit("seed").as("source"))
    val base = java.nio.file.Files.createTempDirectory("graft-ai-scommit")
    try {
      val (idx, outDir, ckpt) = (s"$base/idx", s"$base/out", s"$base/ckpt")
      ArchiveIndex.write(archive, "text", "doc_id", nBuckets = 8, idx)
      val novel = "completely novel words never archived anywhere"
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String)]
      val q = graft.streaming.StreamPipeline.corpusCommitStart(
        in.toDF.toDF("doc_id", "text", "source"), "text", "doc_id",
        idx, outDir, minQuality = -1.0, ckpt, availableNow = false)
      try {
        in.addData((101L, novel, "w0"))
        q.processAllAvailable()
        // wave 1: an exact copy of wave 0's survivor — droppable ONLY
        // if wave 0's commit landed 101's fp row in the artifact
        in.addData((201L, novel, "w1"), (202L, "another fresh doc of " +
          "sufficient length entirely", "w1"))
        q.processAllAvailable()
      } finally q.stop()
      val out = spark.read.parquet(outDir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(out.contains((101L, 0L)), s"wave-0 survivor missing: $out")
      assert(!out.exists(_._1 == 201L),
        s"exact copy of a committed survivor was NOT dropped: $out")
      assert(out.contains((202L, 1L)), s"novel wave-1 doc missing: $out")
      // batch probe of the stream-grown fp table: a copy of the
      // streamed survivor must resolve to 101's fp entry
      val probe = Seq((301L, novel)).toDF("doc_id", "text")
      val (kept, _) = TextDedup.incrementalDedup(probe, "text", "doc_id",
        ArchiveIndex.readFp(spark, idx)
          .select("fp", "representative_id"))
      assert(kept.collect().isEmpty,
        "batch probe failed to see the stream-committed fp row")
    } finally rm(base.toFile)
  }

  test("layout parse is versioned: an unknown version fails loudly " +
      "instead of being regex-guessed") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-ver")
    try {
      ArchiveIndex.write(archive, "text", "id", nBuckets = 8,
        base.toString)
      assert(ArchiveIndex.nBuckets(spark, base.toString) == 8)
      // drop the local-FS checksum shadow before editing the file
      // out-of-band, or Hadoop rejects the read with ChecksumException
      java.nio.file.Files.deleteIfExists(
        base.resolve("._archive_layout.json.crc"))
      java.nio.file.Files.write(
        base.resolve("_archive_layout.json"),
        """{"version":99,"nBuckets":8}""".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        ArchiveIndex.nBuckets(spark, base.toString)
      }
      assert(e.getMessage.contains("version 99"),
        s"wrong failure: ${e.getMessage}")
    } finally rm(base.toFile)
  }
}

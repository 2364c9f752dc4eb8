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

  private def hadoopFs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("multi-writer CAS: two interleaved appenders both land — both " +
      "batches visible, versions strictly increasing, no lost update") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-cas")
    try {
      val dir = s"$base/fp"
      ArchiveIndex.writeBucketedTable(
        TextDedup.exactDedup(archive, "text", "id"), "fp", dir, 8)
      def fpSet() = ArchiveIndex.readBucketedTable(spark, dir)
        .select("fp", "representative_id", "n_copies").collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      val before = fpSet()
      val batchA = TextDedup.exactDedup(Seq(
        (100L, "writer a first doc entirely fresh words"),
        (101L, "writer a second doc other fresh words")).toDF("id", "text"),
        "text", "id").localCheckpoint()
      val batchB = TextDedup.exactDedup(Seq(
        (200L, "writer b first doc distinct vocabulary here"),
        (201L, "writer b second doc more distinct vocabulary"))
        .toDF("id", "text"), "text", "id").localCheckpoint()
      val wantA = batchA.collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      val wantB = batchB.collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      // align the two appenders on a latch so their stage+commit
      // windows overlap as tightly as the scheduler allows
      val gate = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val ts = Seq(batchA, batchB).map { b =>
        new Thread(() => {
          try { gate.await(); ArchiveIndex.appendBucketedTable(b, "fp", dir, 8) }
          catch { case e: Throwable => errs.add(e) }
        })
      }
      ts.foreach(_.start()); gate.countDown(); ts.foreach(_.join())
      assert(errs.isEmpty, s"appender failed: ${errs.peek()}")
      assert(fpSet() == before ++ wantA ++ wantB,
        "a concurrent append was lost or corrupted")
      // versions strictly increasing: v1 (write) + one commit per append
      val f = hadoopFs(dir)
      val versions = Option(new java.io.File(s"$dir/_manifests")
        .listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.matches("v\\d{12}\\.json"))
        .map(_.stripPrefix("v").stripSuffix(".json").toLong).sorted
      assert(versions.toSeq == Seq(1L, 2L, 3L),
        s"expected versions 1,2,3 after two racing appends: " +
          versions.mkString(","))
    } finally rm(base.toFile)
  }

  test("compact-vs-append CAS: a compaction whose base was appended to " +
      "carries the appended files forward; a compaction whose inputs " +
      "another compaction rewrote ABORTS (loser retries/aborts, no " +
      "double rows)") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-cvc")
    try {
      val dir = s"$base/fp"
      ArchiveIndex.writeBucketedTable(
        TextDedup.exactDedup(archive, "text", "id"), "fp", dir, 4)
      val f = hadoopFs(dir)
      val baseFiles = ArchiveIndex.currentManifest(spark, dir).get.toSet
      // an append lands AFTER the compactor resolved `baseFiles`
      ArchiveIndex.appendBucketedTable(
        TextDedup.exactDedup(
          Seq((50L, "racing appended doc with novel words"))
            .toDF("id", "text"), "text", "id"), "fp", dir, 4)
      val appended = ArchiveIndex.currentManifest(spark, dir).get.toSet
      val appendedOnly = appended -- baseFiles
      assert(appendedOnly.nonEmpty)
      // fabricate the compactor's packed output for base snapshot v1:
      // byte-copies of the base files under generation names
      def fabricate(tag: String): Seq[String] = baseFiles.toSeq.map { rel =>
        val Array(bkt, name) = rel.split('/')
        val out = s"$bkt/g$tag-$name"
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/$rel"),
          java.nio.file.Paths.get(s"$dir/$out"))
        out
      }
      val packed1 = fabricate("A")
      assert(ArchiveIndex.commitCompactRetrying(
          f, dir, 1L, baseFiles, packed1),
        "compaction racing an APPEND must win after carrying the delta")
      val after = ArchiveIndex.currentManifest(spark, dir).get.toSet
      assert(after == packed1.toSet ++ appendedOnly,
        s"carried-forward manifest wrong: $after")
      // a SECOND compaction of the same stale base must abort: its
      // inputs are no longer in the live snapshot
      val packed2 = fabricate("B")
      assert(!ArchiveIndex.commitCompactRetrying(
          f, dir, 1L, baseFiles, packed2),
        "compaction whose inputs were rewritten must abort, not commit")
      assert(ArchiveIndex.currentManifest(spark, dir).get.toSet == after,
        "aborted compaction mutated the manifest")
    } finally rm(base.toFile)
  }

  test("GC grace keys on SUPERSESSION time: a file written long ago " +
      "but compacted away a moment ago survives the grace window") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-grace")
    try {
      val dir = s"$base/fp"
      ArchiveIndex.writeBucketedTable(
        TextDedup.exactDedup(archive, "text", "id"), "fp", dir, 8)
      def fpSet(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSet
      // age BOTH the v1 manifest and its data files two hours into the
      // past — the scenario where a creation-mtime grace breaks: the
      // files' own age already exceeds any reasonable grace
      val old = System.currentTimeMillis() - 2L * 3600 * 1000
      ArchiveIndex.currentManifest(spark, dir).get.foreach { rel =>
        assert(new java.io.File(s"$dir/$rel").setLastModified(old))
      }
      assert(new java.io.File(s"$dir/_manifests/v000000000001.json")
        .setLastModified(old))
      val pinned = ArchiveIndex.readBucketedTable(spark, dir)
        .select("fp", "representative_id", "n_copies")
      val want = fpSet(pinned)
      // compact with a ONE-hour grace: supersession is NOW, so nothing
      // may be deleted even though every superseded file is 2h old
      ArchiveIndex.compactBucketedDir(spark, dir,
        gcGraceMs = 3600L * 1000)
      def oldGenFiles() =
        Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("bkt="))
          .flatMap(b => Option(b.listFiles()).getOrElse(Array.empty))
          .map(_.getName).filter(n => n.endsWith(".parquet") &&
            !n.startsWith("g"))
      assert(oldGenFiles().nonEmpty,
        "grace keyed on creation time: old-but-just-superseded files " +
          "were GC'd inside the window")
      assert(fpSet(pinned) == want,
        "reader pinned to the pre-compaction snapshot lost its files")
      // and a grace-0 pass still collects them afterwards
      ArchiveIndex.gcUnreferenced(spark, dir, gcGraceMs = 0L)
      assert(oldGenFiles().isEmpty)
    } finally rm(base.toFile)
  }

  test("empty writes are refused up front; empty appends commit " +
      "nothing (no version churn, table stays readable)") {
    import spark.implicits._
    val archive = archiveRows.toDF("id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-ai-empty")
    try {
      val dir = s"$base/fp"
      val empty = TextDedup.exactDedup(archive, "text", "id")
        .filter(lit(false))
      val e = intercept[IllegalArgumentException] {
        ArchiveIndex.writeBucketedTable(empty, "fp", dir, 8)
      }
      assert(e.getMessage.contains("EMPTY"), e.getMessage)
      assert(!new java.io.File(dir).exists(),
        "refused write left a half-written dir behind")
      // a real write then succeeds at the same path
      ArchiveIndex.writeBucketedTable(
        TextDedup.exactDedup(archive, "text", "id"), "fp", dir, 8)
      val v = ArchiveIndex.currentManifest(spark, dir).get.toSet
      ArchiveIndex.appendBucketedTable(empty, "fp", dir, 8)
      assert(ArchiveIndex.currentManifest(spark, dir).get.toSet == v,
        "empty append committed a new manifest version")
    } finally rm(base.toFile)
  }

  test("persisted IVF index: write + incremental grow + compact " +
      "through the manifest lifecycle is row-identical to the " +
      "session-frame search, and the vec table reaches the packed " +
      "floor") {
    import spark.implicits._
    import graft.ext.IvfIndex
    val rnd = new scala.util.Random(7)
    val emb = (0L until 40L).map(i =>
        (i, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val m = IvfIndex.seedModel(emb, nlist = 4)
    val want = IvfIndex.searchDeterministic(emb, m,
        col("vec_id") < 4, k = 3, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    graft.ops.CacheScope.releaseAll()
    val base = java.nio.file.Files.createTempDirectory("graft-ai-ivf")
    try {
      val dir = s"$base/ivf"
      IvfIndex.writeIndex(emb.filter(col("vec_id") % 2 === 0), m, dir, 8)
      IvfIndex.appendVectors(emb.filter(col("vec_id") % 2 === 1), dir)
      def got() = {
        val r = IvfIndex.searchOnDisk(spark, dir,
            col("vec_id") < 4, k = 3, nprobe = 2)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getInt(3)))
          .toSet
        graft.ops.CacheScope.releaseAll()
        r
      }
      assert(got() == want,
        "disk-grown index search drifted from the session-frame search")
      IvfIndex.compactIndex(spark, dir)
      assert(got() == want, "compaction changed search results")
      // packed floor: one data file per bucket dir of the vec table
      Option(new java.io.File(IvfIndex.vecDir(dir)).listFiles())
        .getOrElse(Array.empty)
        .filter(_.getName.startsWith("bkt=")).foreach { b =>
          val n = Option(b.listFiles()).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet"))
          assert(n == 1, s"${b.getPath}: $n files after compaction")
        }
      // model survives the round-trip bit-exactly
      assert(IvfIndex.readModel(spark, dir).centroids.map(_.toSeq) ===
        m.centroids.map(_.toSeq))
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

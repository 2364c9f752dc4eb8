package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE archive index format — one writer/reader for the on-disk
  * artifact every archive-aware consumer shares (r11 VERDICT #5: the
  * batch incremental build, the streaming grow+prune capstone, and the
  * corpus-DQ monitor each carried their own layout convention; now
  * there is exactly one).
  *
  * Layout under a single root directory:
  * {{{
  *   <dir>/_archive_layout.json        {"version":1,"nBuckets":N}
  *   <dir>/fp/bkt=K/part-....parquet   (fp, representative_id, n_copies)
  *   <dir>/ib/bkt=K/part-....parquet   (id, band)
  *   <dir>/ih/bkt=K/part-....parquet   (id, hs)
  * }}}
  *
  * Each table is hash-bucket-partitioned on ITS probe key
  * (`bkt = pmod(xxhash64(key), nBuckets)` — fp by fingerprint, ib by
  * band, ih by doc id), so a batch or micro-batch probe reads only its
  * touched buckets (partition pruning at planning time — the measured
  * constant-read-volume property of SCALEPROBE_r11), and the layout is
  * compaction-aware: appends land O(batch) files inside the same
  * partition dirs, and [[compact]] executes
  * [[Curation.compactionPlan]] over the real file manifest to restore
  * the packed floor without touching row content. The layout file
  * makes the artifact self-describing — readers recover `nBuckets`
  * from the root instead of trusting the caller to remember it.
  *
  * At 100 TB: the fp table is one row per distinct content, ib is
  * doc·bands rows, ih one row per doc — all index-sized, never
  * corpus-sized; bucket count is sized to the archive (fixed MB per
  * bucket) and the three tables share one maintenance pass. */
object ArchiveIndex {
  val Version = 1

  def fpDir(dir: String): String = s"$dir/fp"
  def ibDir(dir: String): String = s"$dir/ib"
  def ihDir(dir: String): String = s"$dir/ih"
  private def layoutPath(dir: String) = s"$dir/_archive_layout.json"

  private def bktCol(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets))

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write one bucket-partitioned table. `repartition` ON the bucket
    * key first: each bucket dir then holds exactly ONE file, so the
    * per-probe listing is O(nBuckets) — constant as the archive grows —
    * instead of O(writer tasks × nBuckets) shards. */
  def writeBucketedTable(df: DataFrame, keyCol: String, dir: String,
      nBuckets: Int): Unit =
    df.withColumn("bkt", bktCol(keyCol, nBuckets))
      .repartition(col("bkt"))
      .write.partitionBy("bkt").parquet(dir)

  /** Append a batch's rows INTO an existing bucket layout — the stream
    * grow path: O(batch) files landing in the partition dirs later
    * probes prune against; [[compact]] is the matching maintenance
    * pass that keeps per-bucket file counts at the packed floor. */
  def appendBucketedTable(df: DataFrame, keyCol: String, dir: String,
      nBuckets: Int): Unit =
    df.withColumn("bkt", bktCol(keyCol, nBuckets))
      .write.partitionBy("bkt").mode("append").parquet(dir)

  /** Build and write the full three-table index of `archive`. */
  def write(archive: DataFrame, textCol: String, idCol: String,
      nBuckets: Int, dir: String, n: Int = 3, k: Int = 8,
      bands: Int = 4): Unit = {
    require(nBuckets > 0, "ArchiveIndex.write: nBuckets must be positive")
    val spark = archive.sparkSession
    writeBucketedTable(TextDedup.exactDedup(archive, textCol, idCol),
      "fp", fpDir(dir), nBuckets)
    val (ib, ih) = TextDedup.lshIndex(archive, textCol, idCol, n, k, bands)
    writeBucketedTable(ib, "band", ibDir(dir), nBuckets)
    writeBucketedTable(ih, "id", ihDir(dir), nBuckets)
    val f = fs(spark, dir)
    val out = f.create(
      new org.apache.hadoop.fs.Path(layoutPath(dir)), true)
    out.write(
      s"""{"version":$Version,"nBuckets":$nBuckets}""".getBytes("UTF-8"))
    out.close()
  }

  /** Recover the layout's bucket count from the self-describing root. */
  def nBuckets(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(layoutPath(dir))
    val in = fs(spark, dir).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    "\"nBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"ArchiveIndex: malformed layout file at ${layoutPath(dir)}"))
  }

  /** Fingerprint index (fp, representative_id, n_copies) — the exact
    * gate's archive side ([[TextDedup.incrementalDedup]]). */
  def readFp(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(fpDir(dir))
      .select("fp", "representative_id", "n_copies")

  /** LSH band index (id, band) — the near-dedup probe's collision side
    * ([[TextDedup.incrementalLshPairs]]). */
  def readBands(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ibDir(dir)).select("id", "band")

  /** LSH hash-set index (id, hs) — the Jaccard verify side. */
  def readHashes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(ihDir(dir)).select("id", "hs")

  /** COMPACT one bucket-partitioned table dir IN PLACE by EXECUTING
    * [[Curation.compactionPlan]] against its REAL file manifest (one
    * row per data file — bounded by file COUNT, the very quantity
    * compaction exists to bound, never by data): the plan assigns each
    * input file an `out_file` group per bucket by cumulative-offset
    * packing at `targetBytes`, then ONE distributed job reads the dir,
    * tags rows with their source file (`input_file_name`),
    * broadcast-joins the plan, repartitions on (bkt, out_file) — each
    * plan group lands in one task, each task writes one file per
    * bucket dir it holds — and rewrites to a staging dir. The swap
    * into place is two directory renames (stage → live after
    * live → tombstone), safe under the SINGLE-writer ingest loop; a
    * production lakehouse would commit the same rewrite as a
    * table-format snapshot instead of a rename, with identical
    * read-side semantics. Row content is untouched — compaction is
    * lossless by construction, and `q_stream_dedup_lsh_grow_compact`
    * pins that end-to-end by sharing the uncompacted grow oracle. */
  def compactBucketedDir(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(live)) return
    val files = f.listStatus(live)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bkt="))
      .flatMap { d =>
        val bkt = d.getPath.getName.stripPrefix("bkt=").toLong
        f.listStatus(d.getPath)
          .filter(x => x.isFile && x.getPath.getName.endsWith(".parquet"))
          .map(x => (bkt, x.getPath.getName, x.getLen))
      }
    if (files.isEmpty) return
    val manifest = spark.createDataFrame(files.toSeq)
      .toDF("bkt", "fname", "bytes")
    val plan = Curation.compactionPlan(
        manifest, "fname", "bytes", targetBytes, Seq("bkt"))
      .select(col("bkt").as("__pbkt"), col("fname").as("__pf"),
        col("out_file").as("__of"))
    val staged = new Path(dir + ".compact")
    val tomb = new Path(dir + ".old")
    f.delete(staged, true); f.delete(tomb, true)
    spark.read.parquet(dir)
      .withColumn("__f", regexp_extract(input_file_name(), "[^/]+$", 0))
      .join(broadcast(plan), col("bkt").cast("long") === col("__pbkt")
        && col("__f") === col("__pf"))
      .repartition(col("bkt"), col("__of"))
      .drop("__f", "__pbkt", "__pf", "__of")
      .write.partitionBy("bkt").parquet(staged.toString)
    // rename-swap: live → tombstone first, so a failure between the
    // two renames leaves the data recoverable rather than deleted
    require(f.rename(live, tomb) && f.rename(staged, live),
      s"ArchiveIndex.compactBucketedDir: rename-swap failed for $dir")
    f.delete(tomb, true)
    ()
  }

  /** One maintenance pass over the whole artifact: compact all three
    * tables (a subdir a consumer never appended to is a no-op). */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Unit = {
    compactBucketedDir(spark, fpDir(dir), targetBytes)
    compactBucketedDir(spark, ibDir(dir), targetBytes)
    compactBucketedDir(spark, ihDir(dir), targetBytes)
  }

  /** Copy a (bounded) result into a SELF-CONTAINED local DataFrame so a
    * registered adapter can delete its temp index tree before
    * returning — the runAvailableNow convention, shared here by the
    * batch adapters that round-trip through the on-disk format. Test
    * adapter plumbing, bounded by the batch-sized result; the operator
    * itself never collects. */
  private[graft] def localFrame(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}

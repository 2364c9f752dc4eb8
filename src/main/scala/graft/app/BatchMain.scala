package graft.app

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sources.CsvSource
import graft.streaming.StreamPipeline

/** Batch driver — the `lambda_handler` equivalent (SURVEY.md §3.2):
  * list the raw landing dir (S4 mtime window + S2 name filter), route each
  * file by name (S5), read it with encoding fallback (S3), clean per class,
  * land cleaned CSVs (K2). Listing uses the Hadoop FileSystem API, so the
  * same code walks file://, hdfs:// or s3a:// landing zones.
  *
  * Usage: runMain graft.app.BatchMain <rawDir> <outDir> [modifiedAfterMs]
  */
object BatchMain {
  def main(args: Array[String]): Unit = {
    val rawDir = args(0)
    val outDir = args(1)
    val modifiedAfterMs = if (args.length > 2) Some(args(2).toLong) else None
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, rawDir, outDir, modifiedAfterMs)
    spark.stop()
  }

  def run(spark: SparkSession, rawDir: String, outDir: String,
      modifiedAfterMs: Option[Long]): Unit = {
    val path = new Path(rawDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).toSeq
      .filter(_.isFile)
      .filter(f => modifiedAfterMs.forall(f.getModificationTime > _)) // S4
      .filter(f => CsvSource.rawNameFilter(f.getPath.getName.toLowerCase)) // S2
    // reference keeps one variable per class — last file of a class wins
    // (SURVEY.md §3.2 step 2); preserved via maxBy(mtime)
    files.groupBy(f => CsvSource.classify(f.getPath.getName))
      .foreach { case (cls, clsFiles) =>
        val latest = clsFiles.maxBy(_.getModificationTime)
        val df = CsvSource.read(spark, latest.getPath.toString)
        StreamPipeline.cleanAndWrite(df, cls, outDir)
      }
  }
}

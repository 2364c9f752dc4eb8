package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch: run every registered query once at a small SF, printing the
  * name BEFORE each run — pinpoints which query trips non-fatal engine
  * warnings (e.g. a codegen fallback) that Verify's log interleaving hides.
  * Not part of the driver contract. */
object DevSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.foreach { q =>
      System.err.println(s"[sweep] >>> ${q.name}")
      val t0 = System.nanoTime()
      try {
        q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
        System.err.println(
          f"[sweep] <<< ${q.name} ok ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[sweep] <<< ${q.name} FAILED: ${e.getMessage}")
      } finally graft.ops.CacheScope.releaseAll()
    }
    spark.stop()
  }
}

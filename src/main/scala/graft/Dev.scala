package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main for timing/plan inspection (not part of the driver
  * contract). Usage: runMain graft.Dev <sfDir> <queryName> [reps] */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "q1_pricing_summary"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // noop write, NOT count(): count lets Catalyst eliminate
      // row-preserving joins/projections and time a hollowed-out plan
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      graft.ops.CacheScope.releaseAll()
      println(f"[dev] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    fn(spark, sfDir).explain("formatted")
    graft.ops.CacheScope.releaseAll() // the explain build persists too
    spark.stop()
  }
}

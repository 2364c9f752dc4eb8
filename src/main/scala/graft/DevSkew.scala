package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: salted vs unsalted wall time for the skewed band join
  * (PLANS.md evidence; not part of the driver contract). */
object DevSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hotUs = 1717243200L * 1000000L
    def build(maxRows: Long) = {
      val ev = Tables.events(spark, sfDir)
      def skewKey(id: org.apache.spark.sql.Column,
          ts: org.apache.spark.sql.Column) =
        when(id % 64 === 0, lit(hotUs) + (id % 1000) * 1000L)
          .otherwise(unix_micros(ts))
      val l = ev.select(col("event_id"), col("user_id"),
        skewKey(col("event_id"), col("ts")).as("l_us"))
      val r = ev.select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"),
        skewKey(col("event_id"), col("ts")).as("r_us"),
        col("value").as("r_value"))
      graft.ops.BandJoin(l, r, "l_us", "r_us", 60L * 1000000,
          maxBucketRows = maxRows)
        .filter(col("r_event_id") =!= col("event_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_nearby"),
          graft.Det.dsum(col("r_value")).as("nearby_value"))
    }
    Seq(Long.MaxValue, 200L, Long.MaxValue, 200L, Long.MaxValue, 200L)
      .foreach { s =>
        val t0 = System.nanoTime()
        build(s).write.mode("overwrite").format("noop").save()
        val tag = if (s == Long.MaxValue) "unsalted" else s"maxRows=$s"
        println(f"[skew] $tag%-12s: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: run one registry query full-plan with a stage listener to
  * locate where wall-clock goes (not part of the driver contract). */
object DevStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "amazon_pipeline_e2e"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L)
          - si.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 0.3)
          println(f"[listener] stage ${si.stageId} '${si.name.take(60)}' " +
            f"tasks=${si.numTasks} wall=$wall%.2f s")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // noop write, NOT count() — see Dev.scala
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      graft.ops.CacheScope.releaseAll()
      println(f"[dev] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: run one registry query with a JOB-level listener (every job
  * and every stage, no threshold) to count fixed per-round scheduling
  * cost in iterative loops (not part of the driver contract). */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "ext_bradley_terry"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        println(f"[job] ${j.jobId}%4d stages=${j.stageInfos.size} " +
          j.stageInfos.map(_.name.takeWhile(_ != '(').trim)
            .mkString("{", ",", "}").take(120))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += 1
        val wall = (si.completionTime.getOrElse(0L)
          - si.submissionTime.getOrElse(0L)) / 1e3
        println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"wall=$wall%5.2f s  '${si.name.take(60)}'")
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      jobs = 0; stages = 0
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      graft.ops.CacheScope.releaseAll()
      println(f"[dev] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" jobs=$jobs stages=$stages")
    }
    spark.stop()
  }
}

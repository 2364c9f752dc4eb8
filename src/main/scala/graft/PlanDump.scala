package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: print the formatted physical plan of registered queries —
  * the evidence PLANS.md quotes. Usage:
  * `runMain graft.PlanDump <sfDir> <name> [name ...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n==== $n ====")
      println(Registry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
      graft.ops.CacheScope.releaseAll()
    }
    spark.stop()
  }
}

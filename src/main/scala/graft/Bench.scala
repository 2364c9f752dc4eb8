package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: per query, one warm-up run then `BENCH_REPS` timed runs,
  * reporting the median — this box shows multi-second environment stalls
  * (hypervisor pauses) that would otherwise dominate a single-shot number.
  * Each run forces FULL materialization through the noop sink (a bare
  * `count()` would let Catalyst prune the projections being measured).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Registry.all.filter(_.bench)
    def runOnce(q: Q): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = headline.map { q =>
      try {
        runOnce(q) // warm-up: codegen + broadcast build
        val times = (1 to reps).map(_ => runOnce(q)).sorted
        q.name -> times(times.length / 2)
      } catch { case _: Throwable => q.name -> -1.0 }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

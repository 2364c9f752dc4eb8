package graft

import org.apache.spark.sql.SparkSession

/** State-store provider A/B bench (dev tool, like [[ScaleProbe]]): times
  * the stateful streaming headliners under the default
  * HDFSBackedStateStoreProvider and under RocksDB with changelog
  * checkpointing ([[graft.streaming.StreamPipeline.useRocksDbStateStore]]
  * carries the 100 TB rationale — bounded executor memory + delta-only
  * checkpoint uploads), evidencing the large-state path the streaming
  * story claims.
  *
  * Expectation at local test scale: RocksDB is SLOWER (JNI boundary +
  * disk writes vs a heap map that trivially fits) — the point of the
  * measurement is that the provider swap is a working, output-identical
  * configuration whose crossover argument is memory, not test-SF speed.
  * Output rows are asserted identical across providers per query.
  *
  * Prints one JSON line:
  * {"metric":"statestore","queries":{name:{"hdfs":s,"rocksdb":s,"rows":n}},"sf":dir}
  */
object StateStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("q_stream_attribution", "q_stream_growth_accounting",
      "q_stream_dedup_lsh")
    val qs = Registry.all.filter(q => names.contains(q.name))

    def runOnce(q: Q): (Double, Long) = {
      val t0 = System.nanoTime()
      val n =
        try q.run(spark, sfDir).count()
        finally graft.ops.CacheScope.releaseAll()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // providers switch through the BUILDER config hook
    // (StreamPipeline.StateStoreConfKey, applied at every stream
    // start) — the bench exercises the exact path a production caller
    // flips, not a side door
    def setProvider(p: String): Unit =
      spark.conf.set(graft.streaming.StreamPipeline.StateStoreConfKey, p)

    val out = qs.map { q =>
      // warm-up + timed reps per provider; min across reps (the Bench
      // throttle-noise methodology)
      setProvider("default")
      runOnce(q)
      val (hdfsTimes, hdfsRows) = {
        val rs = (1 to reps).map(_ => runOnce(q))
        (rs.map(_._1), rs.head._2)
      }
      setProvider("rocksdb")
      runOnce(q)
      val (rocksTimes, rocksRows) = {
        val rs = (1 to reps).map(_ => runOnce(q))
        (rs.map(_._1), rs.head._2)
      }
      setProvider("default")
      require(hdfsRows == rocksRows,
        s"${q.name}: provider changed row count $hdfsRows -> $rocksRows")
      System.err.println(f"[ssbench] ${q.name}: hdfs=${hdfsTimes.min}%.2f " +
        f"rocksdb=${rocksTimes.min}%.2f rows=$hdfsRows")
      q.name ->
        f""""${q.name}":{"hdfs":${hdfsTimes.min}%.3f,"rocksdb":${rocksTimes.min}%.3f,"rows":$hdfsRows}"""
    }
    val json = s"""{"metric":"statestore","queries":{${out.map(_._2).mkString(",")}},"sf":"$sfDir"}"""
    println(json)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_statestore_r11.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}

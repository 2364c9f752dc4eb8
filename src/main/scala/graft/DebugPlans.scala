package graft
import org.apache.spark.sql.SparkSession
/** Plan-audit utility: dumps formatted physical plans for the named
  * queries (default: a representative set). Usage:
  *   runMain graft.DebugPlans [sfDir] [q1,q2,...]
  */
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "p1_drop_columns",
        "ext_text_stats", "d2_conflict_split_clean")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"########## $name")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc check: SparkEntry.entry on a BARE session (driver t1 smoke shape —
  * no graft confs pre-applied). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    // also exercise a TS query (events read) on the same bare session
    val m = graft.SparkEntry.queries("q_ts_time_window_agg")(spark, "/root/testdata/sf0.001").count()
    println(s"ts rows=$m")
    spark.stop()
  }
}

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

/** Verifies GraftExtensions wiring on a session built with withExtensions
  * (no explicit register call). Separate main = fresh JVM/session. */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .withExtensions(new graft.engine.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 1.0d)) AS c, hex_to_dec('ff') AS h")
      .collect()(0)
    println(f"ext cosine=${r.getDouble(0)}%.6f hex=${r.getLong(1)}")
    spark.stop()
  }
}

package graft.tools

import graft.engine.GraftSession
import graft.queries.Registry

/** Print the formatted physical plan (and optionally run+time) registered
  * queries. Usage: runMain graft.tools.Explain <queryName>[,<name2>...]
  * [sfDir] [--run]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.01")
    val run = args.contains("--run")
    val spark = GraftSession.local(16)
    names.foreach { n =>
      val q = Registry.byName(n)
      val df = q.build(spark, dir)
      println(s"========== $n ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (run) {
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}

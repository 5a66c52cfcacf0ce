package graft.tools

import graft.engine.{GraftSession, Tables}
import graft.tql.TqlCompiler

/** CLI: run a TQL query against a TESTDATA container.
  * Usage: runMain graft.tools.TqlRun <container> <tql> [sfDir]
  */
object TqlRun {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: TqlRun <container> <tql> [sfDir]")
      sys.exit(2)
    }
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8)
    try {
      val df = TqlCompiler.run(Tables.container(spark, dir, args(0)), args(1))
      df.show(50, truncate = false)
    } catch {
      case e: graft.tql.TqlParseException =>
        System.err.println(s"TQL error: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }
}

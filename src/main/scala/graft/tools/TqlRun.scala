package graft.tools

import graft.engine.{GraftSession, Tables}
import graft.tql.{PartialFetch, TqlCompiler}

/** CLI: run a TQL query against a TESTDATA container.
  * Usage: runMain graft.tools.TqlRun <container> <tql> [sfDir] [--partial[=N]]
  *
  * `--partial` runs the query through the FetchOption.PARTIAL_EXECUTION
  * cursor (range-divided lazy execution) and prints the first N rows
  * (default 50) plus how many ranges actually executed — the CLI face of
  * tql/PartialFetch. */
object TqlRun {
  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    if (pos.length < 2) {
      System.err.println("usage: TqlRun <container> <tql> [sfDir] [--partial[=N]]")
      sys.exit(2)
    }
    val dir = if (pos.length > 2) pos(2) else "/root/testdata/sf0.001"
    val partial = flags.collectFirst {
      case f if f == "--partial" => 50
      case f if f.startsWith("--partial=") => f.stripPrefix("--partial=").toInt
    }
    val spark = GraftSession.local(8)
    try {
      val container = Tables.container(spark, dir, pos(0))
      partial match {
        case Some(n) =>
          val rs = PartialFetch.fetch(container, pos(1))
          rs.take(n).foreach(println)
          println(s"[partial] ${rs.rangesExecuted}/${rs.totalRanges} ranges executed")
        case None =>
          TqlCompiler.run(container, pos(1)).show(50, truncate = false)
      }
    } catch {
      case e: graft.tql.TqlParseException =>
        System.err.println(s"TQL error: ${e.getMessage}")
        sys.exit(1)
      case e: IllegalArgumentException =>
        System.err.println(s"TQL error: ${e.getMessage}")
        sys.exit(1)
    } finally spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Offline wide fuzz sweep: generate seeds [from, until) from the SQL and
  * TQL grammar fuzzers, dump each result in graft.Verify's output format
  * (one parquet dir per query + oracle_sql.json), and let
  * tools/check_correctness.py differentially compare against DuckDB.
  *
  * The registered fuzz sets pin 24 SQL + 12 TQL seeds for the driver; this
  * main is the wide net run ad hoc per round (hundreds to thousands of
  * seeds) to hunt interaction bugs before they reach a user. Usage:
  *   runMain graft.tools.FuzzSweep <sfDir> <outDir> <sqlFrom> <sqlUntil> <tqlFrom> <tqlUntil>
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val (sqlFrom, sqlUntil) = (args(2).toInt, args(3).toInt)
    val (tqlFrom, tqlUntil) = (args(4).toInt, args(5).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.engine.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_NO_BHJ=1 disables broadcast joins for the sweep: at fuzz
    // SFs every join is under the broadcast threshold, so the session's
    // preferSortMergeJoin=false default (r12) would otherwise never reach
    // the shuffled-hash code paths differential fuzz is meant to cover
    // (r12 ADVICE: the committed clean bands predate the SHJ flip).
    if (sys.env.get("SPARK_GRAFT_NO_BHJ").contains("1"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    graft.engine.GraftSession.prepare(spark)
    graft.engine.Tables.registerAll(spark, sfDir)
    new java.io.File(outDir).mkdirs()

    val oracle = scala.collection.mutable.LinkedHashMap[String, String]()
    var failed = 0

    def dump(name: String, duck: String)(build: => org.apache.spark.sql.DataFrame): Unit =
      try {
        build.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        oracle(name) = duck
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzzsweep] $name BUILD FAILED: ${e.getMessage}")
      }

    for (s <- sqlFrom until sqlUntil) {
      val text = graft.queries.FuzzQueries.genSql(s)
      dump(f"fz_sql_$s%04d", text)(graft.engine.GraftSql.sql(spark, text))
    }
    for (s <- sqlFrom until sqlUntil) {
      val text = graft.queries.FuzzQueries.genSql2(s)
      dump(f"fz_sql2_$s%04d", text)(graft.engine.GraftSql.sql(spark, text))
    }
    for (s <- sqlFrom until sqlUntil) {
      val text = graft.queries.FuzzQueries.genSql3(s)
      dump(f"fz_sql3_$s%04d", text)(graft.engine.GraftSql.sql(spark, text))
    }
    for (s <- sqlFrom until sqlUntil) {
      val text = graft.queries.FuzzQueries.genSql4(s)
      dump(f"fz_sql4_$s%04d", text)(graft.engine.GraftSql.sql(spark, text))
    }
    for (s <- sqlFrom until sqlUntil) {
      val text = graft.queries.FuzzQueries.genSql5(s)
      dump(f"fz_sql5_$s%04d", text)(graft.engine.GraftSql.sql(spark, text))
    }
    // optional 7th/8th args: pipeline-chain (genFuzz6) seed range
    if (args.length > 7) {
      for (s <- args(6).toInt until args(7).toInt) {
        val (builder, duck) = graft.queries.FuzzQueries.genFuzz6(s)
        dump(f"fz_fz6_$s%04d", duck)(builder(spark, sfDir))
      }
    }
    // optional 9th/10th args: incremental-ingest chain (genFuzz7) seed range
    if (args.length > 9) {
      for (s <- args(8).toInt until args(9).toInt) {
        val (builder, duck) = graft.queries.FuzzQueries.genFuzz7(s)
        dump(f"fz_fz7_$s%04d", duck)(builder(spark, sfDir))
      }
    }
    // optional 11th/12th args: TVF/index-DDL chain (genFuzz8) seed range
    if (args.length > 11) {
      for (s <- args(10).toInt until args(11).toInt) {
        val (builder, duck) = graft.queries.FuzzQueries.genFuzz8(s)
        dump(f"fz_fz8_$s%04d", duck)(builder(spark, sfDir))
      }
    }
    // the TQL run + comparison-soundness projection is TqlFuzz.runTql —
    // one copy shared with the registered fuzz queries (r14 review)
    for (s <- tqlFrom until tqlUntil) {
      val (tqlTs, duckTs) = graft.queries.TqlFuzz.genTs(s)
      dump(f"fz_tqlts_$s%04d", duckTs)(graft.queries.TqlFuzz.runTql(spark, sfDir, tqlTs))
      val (tql, duck) = graft.queries.TqlFuzz.gen(s)
      dump(f"fz_tql_$s%04d", duck)(graft.queries.TqlFuzz.runTql(spark, sfDir, tql))
      val (tqlG, duckG) = graft.queries.TqlFuzz.genGrammar(s)
      dump(f"fz_tqlgram_$s%04d", duckG)(graft.queries.TqlFuzz.runTql(spark, sfDir, tqlG))
    }

    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    System.err.println(s"[fuzzsweep] ${oracle.size} dumped, $failed build failures")
    spark.stop()
    if (failed > 0) sys.exit(2)
  }
}

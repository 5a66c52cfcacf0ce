package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{GraftSession, Tables}

/** r19 A/B: old vs new forms of q5_join_region and q_window_row_number,
  * alternated in ONE JVM so host drift hits both arms equally.
  * Usage: runMain graft.tools.ProbeR19Ab <dir> [iters]
  */
object ProbeR19Ab {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts = GraftSession.shuffleWidthFor(
      graft.engine.TableStats.treeSize(dir), cpus.toInt)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = shuffleParts).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, dir)

    val discPrice =
      "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"
    def q5Old: DataFrame = spark.sql(
      s"""SELECT n_name, CAST(SUM($discPrice) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin)
    def q5New: DataFrame =
      graft.queries.Registry.byName("q5_join_region").build(spark, dir)
    def winOld: DataFrame = spark.sql(
      """SELECT o_custkey, o_orderkey, rn, prev_price, next_price, running
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rn,
        |    lag(o_totalprice, 1, -1.0) OVER w AS prev_price,
        |    lead(o_totalprice, 1, -1.0) OVER w AS next_price,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin)
    def winNew: DataFrame =
      graft.queries.Registry.byName("q_window_row_number").build(spark, dir)
    def mrOld: DataFrame =
      graft.mr.MatchRecognize.allRowsPerMatch(
          Tables.events(spark, dir), keys = Seq("user_id"),
          orderCols = Seq("ts", "event_id"),
          pattern = "V{3,}",
          defines = Map("V" -> (org.apache.spark.sql.functions.col("event_type") === "view")))
        .select("user_id", "event_id", "match_num", "classifier")
        .orderBy("user_id", "match_num", "event_id")
    def mrNew: DataFrame =
      graft.queries.Registry.byName("q_mr_view_runs").build(spark, dir)

    if (args.contains("--explain")) {
      Seq("q5_old" -> q5Old, "q5_new" -> q5New,
          "win_old" -> winOld, "win_new" -> winNew,
          "mr_old" -> mrOld, "mr_new" -> mrNew).foreach { case (n, df) =>
        println(s"========== $n ==========")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      spark.stop(); return
    }
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }
    val arms = Seq(
      "q5_old" -> (() => q5Old), "q5_new" -> (() => q5New),
      "win_old" -> (() => winOld), "win_new" -> (() => winNew),
      "mr_old" -> (() => mrOld), "mr_new" -> (() => mrNew))
    // warm every arm once
    arms.foreach { case (_, f) => time(f()) }
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
      .withDefaultValue(Vector())
    (1 to iters).foreach { _ =>
      arms.foreach { case (n, f) => acc(n) = acc(n) :+ time(f()) }
    }
    acc.foreach { case (n, ts) =>
      val s = ts.sorted
      println(f"[ab] $n%-8s median=${s(s.length / 2)}%.3f min=${s.head}%.3f  " +
        ts.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}

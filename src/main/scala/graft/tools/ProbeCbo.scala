package graft.tools

import org.apache.spark.sql.SparkSession

/** CBO/stats rehearsal (r10 judge ask #5): does catalog-stats CBO change
  * any headline plan vs the default size-estimate + AQE regime?
  *
  * Method: register the scale tables as CATALOG tables (external parquet),
  * run q5/q3-shaped SQL with CBO off, then `ANALYZE TABLE ... COMPUTE
  * STATISTICS [FOR ALL COLUMNS]`, enable spark.sql.cbo.enabled +
  * joinReorder, and re-run. The FROM order is deliberately adversarial
  * (fact table last, dims first) so CostBasedJoinReorder has something to
  * fix if it fires. Prints join strategy/order markers + wall times.
  * Findings belong in SCALING.md.
  *
  * Usage: runMain graft.tools.ProbeCbo [scaleDir] */
object ProbeCbo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10z")
    // width from data bytes (r12): probing sf100z at width=cores would
    // measure spill, not the planner (SCALING.md Finding 1)
    val width = graft.engine.GraftSession.shuffleWidthFor(
      graft.engine.TableStats.treeSize(dir), 32)
    val spark = graft.engine.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]").appName("graft"),
      shufflePartitions = width).getOrCreate()
    graft.engine.GraftFunctions.registerAll(spark)
    println(s"PROBE width=$width")
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "orders", "lineitem")
    spark.sql("CREATE DATABASE IF NOT EXISTS cboprobe")
    spark.sql("USE cboprobe")
    for (t <- tables) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING parquet LOCATION '$dir/$t.parquet'")
    }

    // q5 shape, SUBOPTIMAL but connected FROM order (dims first, so the
    // naive left-deep order drags customer/orders through the pipeline
    // before the selective region filter + supplier attach; every step is
    // still an equi-join — a disconnected order would cross-join dims and
    // OOM regardless of planner, which tests the heap, not the optimizer)
    val q5 =
      """SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND c_nationkey = n_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC""".stripMargin
    val q3 =
      """SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue,
        |       o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate LIMIT 10""".stripMargin

    def shape(plan: String): String = {
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      val shj = "ShuffledHashJoin".r.findAllIn(plan).size
      s"BHJ=$bhj SMJ=$smj SHJ=$shj"
    }
    def run(label: String, sql: String): Double = {
      val df = spark.sql(sql)
      val t0 = System.nanoTime(); df.collect(); val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-14s ${dt}%7.2f s  ${shape(df.queryExecution.executedPlan.toString)}")
      // optimized join order: the leaf relation sequence left-to-right
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString.linesIterator.next().replaceAll(".*cboprobe\\.", "").takeWhile(_ != '[').trim)
      println(s"PROBE $label order: ${leaves.mkString(" > ")}")
      dt
    }
    def cbo(on: Boolean): Unit = {
      spark.conf.set("spark.sql.cbo.enabled", on.toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
    }

    // r13 (r12 verdict #8): the wall comparison is min-of-3 HOT and
    // ALTERNATES sides (cbo.enabled is runtime-settable) so page-cache and
    // thermal drift cancel — the r12 single-shot 82.3 vs 72.2 s wall was
    // cache-confounded by its own admission. Stats are ANALYZEd up front;
    // one untimed pass per query fills the page cache before timing.
    val t0 = System.nanoTime()
    for (t <- tables) spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
    println(f"PROBE analyze-all ${(System.nanoTime() - t0) / 1e9}%.1f s")
    // optional 2nd arg: which queries to probe (one per invocation keeps a
    // harness-timeout-bounded run inside its budget)
    val wanted = args.lift(1).map(_.split(",").toSet).getOrElse(Set("q5", "q3"))
    for ((name, sql) <- Seq(("q5", q5), ("q3", q3)) if wanted(name)) {
      cbo(on = false); spark.sql(sql).collect() // untimed page-cache warm
      val (off, on) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      for (i <- 1 to 3) {
        cbo(on = false); off += run(s"$name/off$i", sql)
        cbo(on = true); on += run(s"$name/cbo$i", sql)
      }
      println(f"PROBE $name mins: off=${off.result().min}%.2f s cbo=${on.result().min}%.2f s")
    }
    spark.stop()
  }
}
